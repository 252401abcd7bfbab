"""Python UDTFs (Spark 4 user-defined table functions).

The extension surface for 1→many row expansion when the logic genuinely
needs Python (SURVEY §2.10).  Everything hot-path in this engine stays
JVM-side (functions/text.py chunkers are pure column expressions); these
UDTFs exist to cover and test the protocol itself — static returnType,
per-row ``eval`` yielding tuples, SQL ``LATERAL`` correlation.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_words int")
class WordChunks:
    """Split a document into fixed 10-word chunks (context-window
    pre-chunking).  Law mirrors the SQL oracle exactly: split on single
    spaces (empty tokens preserved), group by ``index // 10``, join with
    single spaces."""

    CHUNK = 10

    def eval(self, text: str):  # noqa: D102 — protocol method
        words = (text or "").split(" ")
        for start in range(0, len(words), self.CHUNK):
            part = words[start : start + self.CHUNK]
            yield start // self.CHUNK, " ".join(part), len(part)
