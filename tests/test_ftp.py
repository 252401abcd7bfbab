"""S1/S2 FTP provider tests with a fake in-process FTP server object.

The live DWD endpoint is network-dependent; these tests pin the provider's
behavior (listing, per-task fetch, retry-with-reconnect) by monkeypatching
``ftplib.FTP``.
"""

from __future__ import annotations

import ftplib
import os

import pytest

from radohydro_spark.sources import manifest as M


class FakeFTP:
    """Scripted FTP double: serves FILES, fails the first N RETRs."""

    FILES = {
        "RW-20240101-0050.asc": b"payload-a",
        "RW-20240102-0050.asc": b"payload-b",
    }
    fail_next = 0
    connects = 0

    def __init__(self, host, timeout=None):
        type(self).connects += 1
        self.host = host

    def login(self):
        return "230"

    def cwd(self, path):
        self.path = path

    def nlst(self):
        return sorted(self.FILES)

    def retrbinary(self, cmd, sink):
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            raise OSError("simulated drop")
        name = cmd.split(" ", 1)[1]
        sink(self.FILES[name])

    def quit(self):
        return "221"


@pytest.fixture(autouse=True)
def fake_ftp(monkeypatch):
    FakeFTP.fail_next = 0
    FakeFTP.connects = 0
    monkeypatch.setattr(ftplib, "FTP", FakeFTP)
    # the provider imports FTP inside the function body via `from ftplib
    # import FTP`, so patch the module attribute it resolves at call time
    yield


def test_ftp_list():
    names = M.ftp_list("recent")
    assert names == ["RW-20240101-0050.asc", "RW-20240102-0050.asc"]


def test_ftp_list_retries_then_raises(monkeypatch):
    class AlwaysDown(FakeFTP):
        def __init__(self, host, timeout=None):
            raise OSError("down")

    monkeypatch.setattr(ftplib, "FTP", AlwaysDown)
    with pytest.raises(ConnectionError):
        M.ftp_list("recent", max_retries=1)


def _worker_fake_factory(fail_first: bool):
    """Factory whose fake class is defined in the CLOSURE — cloudpickle
    serializes it by value, so Spark worker processes (which cannot import
    the test module) can still construct it."""
    files = dict(FakeFTP.FILES)
    fail_state = [1 if fail_first else 0]  # shared across reconnects in a task

    def factory():
        class WorkerFake:
            _fail = fail_state

            def login(self):
                return "230"

            def cwd(self, path):
                return None

            def retrbinary(self, cmd, sink):
                if self._fail[0] > 0:
                    self._fail[0] -= 1
                    raise OSError("simulated drop")
                sink(files[cmd.split(" ", 1)[1]])

        return WorkerFake()

    return factory


def test_ftp_fetch_payloads(spark):
    mf = M.listing_manifest(spark, sorted(FakeFTP.FILES))
    got = {
        r.fname: bytes(r.payload)
        for r in M.ftp_fetch_payloads(mf, ftp_factory=_worker_fake_factory(False)).collect()
    }
    assert got == FakeFTP.FILES


def test_ftp_fetch_reconnects_on_drop(spark):
    mf = M.listing_manifest(spark, sorted(FakeFTP.FILES))
    got = {
        r.fname: bytes(r.payload)
        for r in M.ftp_fetch_payloads(mf, ftp_factory=_worker_fake_factory(True)).collect()
    }
    assert got == FakeFTP.FILES


@pytest.mark.network
@pytest.mark.skipif(
    not os.environ.get("RADOHYDRO_NET_TESTS"),
    reason="live DWD endpoint; set RADOHYDRO_NET_TESTS=1 to run",
)
def test_live_dwd_ftp_listing_and_prune():
    """S1 against the real opendata.dwd.de (reference radohydro.py:81-92,
    181-204).  Offline environments skip via the env gate above; with the
    gate set but the host unreachable, the bounded-retry ConnectionError
    also maps to a skip (never a failure)."""
    try:
        names = M.ftp_list("recent", max_retries=1)
    except (ConnectionError, OSError) as exc:  # sandboxed / flaky network
        pytest.skip(f"DWD FTP unreachable: {exc}")
    assert names, "recent radolan directory listed empty"
    # the DWD origin serves RW-<yyyymmdd>.tar.gz day archives; mirrors may
    # expose the extracted hourly RW-<yyyymmdd>-<hhmm>.asc members instead
    import re

    rw = [
        n
        for n in names
        if re.fullmatch(r"RW-?\d{8}(-\d{4})?\.(asc|tar(\.gz)?)", n)
    ]
    assert rw, f"no RW products among {names[:5]}..."
