"""scripts/fetch_models.py: offline failure, checksum, and skip paths.

The real figshare endpoints are unreachable in this environment, so these
tests exercise the control flow with the network layer stubbed out.
"""

import importlib.util
import io
import os
import sys
import urllib.error

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "fetch_models.py",
)


@pytest.fixture()
def fetch_models():
    spec = importlib.util.spec_from_file_location("fetch_models", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_offline_exits_2_with_manual_instructions(fetch_models, tmp_path,
                                                  monkeypatch, capsys):
    def boom(*a, **k):
        raise urllib.error.URLError("no network")

    monkeypatch.setattr(fetch_models.urllib.request, "urlopen", boom)
    rc = fetch_models.main(["--out", str(tmp_path)])
    assert rc == 2
    err = capsys.readouterr().err
    assert "Download manually" in err
    assert "figshare" in err


def test_existing_file_skipped_and_hashed(fetch_models, tmp_path, capsys):
    for name in fetch_models.MODELS:
        (tmp_path / name).write_bytes(b"weights")
    rc = fetch_models.main(["--out", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("exists") == len(fetch_models.MODELS)
    assert fetch_models.sha256_file(str(tmp_path / name)) in out


def test_checksum_mismatch_fails(fetch_models, tmp_path, monkeypatch):
    name = next(iter(fetch_models.MODELS))
    (tmp_path / name).write_bytes(b"weights")
    monkeypatch.setitem(
        fetch_models.MODELS[name], "sha256", "0" * 64
    )

    def urlopen_stub(url, timeout=None):
        class R(io.BytesIO):
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        if "api.figshare" in str(url):
            return R(b'{"files": []}')
        raise AssertionError("unexpected url " + str(url))

    monkeypatch.setattr(fetch_models.urllib.request, "urlopen", urlopen_stub)
    rc = fetch_models.main(["--out", str(tmp_path)])
    assert rc == 2


def test_download_path_writes_file_and_reports_sha(fetch_models, tmp_path,
                                                   monkeypatch, capsys):
    payload = b"model-bytes"
    api_json = (
        '{"files": [{"name": "%s", "download_url": "https://dl/x", '
        '"size": 11}]}'
    )

    class R(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def urlopen_stub(url, timeout=None):
        if "api.figshare" in str(url):
            name = [
                n
                for n, s in fetch_models.MODELS.items()
                if str(s["article"]) in str(url)
            ][0]
            return R((api_json % name).encode())
        return R(payload)

    monkeypatch.setattr(fetch_models.urllib.request, "urlopen", urlopen_stub)
    rc = fetch_models.main(["--out", str(tmp_path),
                            "--pins", str(tmp_path / "pins.json")])
    assert rc == 0
    for name in fetch_models.MODELS:
        assert (tmp_path / name).read_bytes() == payload
    assert "downloaded" in capsys.readouterr().out


def _stub_download(fetch_models, monkeypatch, payload=b"model-bytes",
                   md5=None):
    import hashlib as _hashlib
    supplied = md5 if md5 is not None else _hashlib.md5(payload).hexdigest()
    api_json = (
        '{"files": [{"name": "%s", "download_url": "https://dl/x", '
        '"size": 11, "supplied_md5": "' + supplied + '"}]}'
    )

    class R(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def urlopen_stub(url, timeout=None):
        if "api.figshare" in str(url):
            name = [
                n
                for n, s in fetch_models.MODELS.items()
                if str(s["article"]) in str(url)
            ][0]
            return R((api_json % name).encode())
        return R(payload)

    monkeypatch.setattr(fetch_models.urllib.request, "urlopen", urlopen_stub)


def test_first_verified_fetch_self_pins(fetch_models, tmp_path, monkeypatch,
                                        capsys):
    """After an md5-verified download the sha256 is recorded in the pins
    file; a second run with a DIFFERENT payload then fails the pin."""
    import json

    pins = tmp_path / "pins.json"
    _stub_download(fetch_models, monkeypatch, b"model-bytes")
    rc = fetch_models.main(["--out", str(tmp_path / "a"),
                            "--pins", str(pins)])
    assert rc == 0
    assert "pinned" in capsys.readouterr().out
    recorded = json.loads(pins.read_text())
    for name in fetch_models.MODELS:
        assert recorded[name]["sha256"] == fetch_models.sha256_file(
            str(tmp_path / "a" / name))

    # tampered content on a fresh fetch now fails against the pin
    _stub_download(fetch_models, monkeypatch, b"EVIL-bytes")
    rc = fetch_models.main(["--out", str(tmp_path / "b"),
                            "--pins", str(pins)])
    assert rc == 2


def test_supplied_md5_mismatch_rejected(fetch_models, tmp_path, monkeypatch,
                                        capsys):
    """A download whose bytes don't match figshare's own md5 is a corrupt
    transfer — rejected, nothing pinned."""
    pins = tmp_path / "pins.json"
    _stub_download(fetch_models, monkeypatch, b"model-bytes", md5="0" * 32)
    rc = fetch_models.main(["--out", str(tmp_path / "a"),
                            "--pins", str(pins)])
    assert rc == 2
    assert "corrupt download" in capsys.readouterr().err
    assert not pins.exists()
