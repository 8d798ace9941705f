"""Archive ingestion layer (VERDICT r3 item 7).

The reference downloads + md5-checks + extracts dataset zips
(/root/reference/contrastyou/data/dataset/_ioutils.py:39-192). Zero egress
excuses the network fetch, not the pipeline: these tests build a
reference-layout archive locally, then drive fetch (via an injected opener)
-> verify -> extract -> pack end to end, including the CLI surface.
"""
import shutil
import subprocess
import sys
import tarfile
import zipfile
from pathlib import Path

import numpy as np
import pytest

from spcl_tpu.data.ioutils import (calculate_md5, check_integrity,
                                   download_url, extract_archive,
                                   prepare_dataset)
from spcl_tpu.data.packing import load_packed, pack_png_folder
from tests.test_packing_png import _write_png_tree

REPO = Path(__file__).parents[1]


def _build_acdc_zip(tmp_path, scans=3, slices=4):
    """Reference distribution layout: ACDC-all.zip -> ACDC-all/{train,val}/..."""
    src = tmp_path / "build" / "ACDC-all"
    _write_png_tree(src, mode="train", scans=scans, slices=slices, seed=0)
    _write_png_tree(src, mode="val", scans=2, slices=slices, seed=1)
    zip_path = tmp_path / "ACDC-all.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in sorted(src.rglob("*.png")):
            z.write(p, p.relative_to(src.parent))
    return zip_path


def test_md5_and_integrity(tmp_path):
    f = tmp_path / "blob.bin"
    f.write_bytes(b"spcl" * 1000)
    h = calculate_md5(f)
    assert len(h) == 32
    assert check_integrity(f, h) and check_integrity(f, h.upper())
    assert check_integrity(f, md5=None)
    assert not check_integrity(f, "0" * 32)
    assert not check_integrity(tmp_path / "missing.bin")


def test_download_url_skips_verified_and_rejects_corrupt(tmp_path):
    payload = b"archive-bytes"
    calls = []

    def opener(url, dest):
        calls.append(url)
        Path(dest).write_bytes(payload)

    import hashlib
    good = hashlib.md5(payload).hexdigest()
    p = download_url("fake://x/a.zip", tmp_path, "a.zip", md5=good, opener=opener)
    assert p.read_bytes() == payload and calls == ["fake://x/a.zip"]
    # second call: verified local copy short-circuits the fetch
    download_url("fake://x/a.zip", tmp_path, "a.zip", md5=good, opener=opener)
    assert len(calls) == 1
    # corrupt download raises
    with pytest.raises(RuntimeError, match="integrity"):
        download_url("fake://x/b.zip", tmp_path, "b.zip", md5="0" * 32, opener=opener)


def test_extract_archive_formats(tmp_path):
    src = tmp_path / "tree" / "D"
    (src / "sub").mkdir(parents=True)
    (src / "sub" / "x.txt").write_text("hello")
    ztgt = tmp_path / "D.zip"
    with zipfile.ZipFile(ztgt, "w") as z:
        z.write(src / "sub" / "x.txt", "D/sub/x.txt")
    out = extract_archive(ztgt, tmp_path / "oz")
    assert (out / "D" / "sub" / "x.txt").read_text() == "hello"
    ttgt = tmp_path / "D.tar.gz"
    with tarfile.open(ttgt, "w:gz") as t:
        t.add(src, arcname="D")
    out = extract_archive(ttgt, tmp_path / "ot")
    assert (out / "D" / "sub" / "x.txt").read_text() == "hello"
    with pytest.raises(ValueError, match="unsupported"):
        extract_archive(src / "sub" / "x.txt")
    # remove_finished drops the archive after extraction
    extract_archive(ztgt, tmp_path / "oz2", remove_finished=True)
    assert not ztgt.exists()


def test_prepare_dataset_full_pipeline(tmp_path):
    """fetch (injected) -> md5 -> extract -> folder; idempotent afterwards."""
    zip_path = _build_acdc_zip(tmp_path)
    md5 = calculate_md5(zip_path)
    calls = []

    def opener(url, dest):
        calls.append(url)
        shutil.copyfile(zip_path, dest)

    root = tmp_path / "data"
    folder = prepare_dataset("acdc", root, opener=opener, md5=md5)
    assert folder == root / "ACDC-all" and folder.is_dir()
    assert len(calls) == 1 and "drive.google.com" in calls[0]
    # extracted folder short-circuits everything (reference downloading())
    assert prepare_dataset("acdc", root, opener=opener, md5=md5) == folder
    assert len(calls) == 1
    # wrong pin refuses the archive
    with pytest.raises(RuntimeError, match="integrity"):
        prepare_dataset("acdc", tmp_path / "data2", opener=opener, md5="0" * 32)
    # unknown dataset is a clear error
    with pytest.raises(KeyError, match="unknown dataset"):
        prepare_dataset("nope", root)


def test_zip_to_packed_arrays_end_to_end(tmp_path):
    """The VERDICT #7 'done' bar: a reference-layout zip ingests to packed
    arrays through prepare_dataset + pack_png_folder with zero new code."""
    zip_path = _build_acdc_zip(tmp_path)

    def opener(url, dest):
        shutil.copyfile(zip_path, dest)

    folder = prepare_dataset("acdc", tmp_path / "data", opener=opener,
                             md5=calculate_md5(zip_path))
    ds = pack_png_folder(str(folder), "acdc", mode="train", canvas=64,
                         save_path=str(tmp_path / "acdc_train.npz"))
    assert len(ds) == 3 * 4 and len(ds.unique_scans) == 3
    re = load_packed(str(tmp_path / "acdc_train.npz"))
    np.testing.assert_array_equal(ds.images, re.images)


def test_pack_dataset_cli_from_archive(tmp_path):
    """scripts/pack_dataset.py --archive: extract + md5 + pack via the CLI."""
    zip_path = _build_acdc_zip(tmp_path)
    out = tmp_path / "packed"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "pack_dataset.py"),
         "--archive", str(zip_path), "--md5", calculate_md5(zip_path),
         "--name", "acdc", "--out", str(out), "--canvas", "64"],
        capture_output=True, text=True, cwd=str(REPO))
    assert r.returncode == 0, r.stderr
    tra = load_packed(str(out / "acdc_train.npz"))
    val = load_packed(str(out / "acdc_val.npz"))
    assert len(tra) == 12 and len(val) == 8
    # bad pin fails loudly
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "pack_dataset.py"),
         "--archive", str(zip_path), "--md5", "0" * 32,
         "--name", "acdc", "--out", str(out)],
        capture_output=True, text=True, cwd=str(REPO))
    assert r.returncode != 0 and "md5" in (r.stderr + r.stdout)


# --------------------------------------------------------------- gdrive flow
class _DriveFixture:
    """Local HTTP server mimicking Google Drive's download flows
    (VERDICT r4 item 7): direct bytes for small files; the modern hidden-form
    interstitial and the legacy download_warning-cookie flow for large ones."""

    def __init__(self, payload: bytes, flow: str):
        import http.server
        import threading
        fixture = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                from urllib.parse import parse_qs, urlparse
                q = parse_qs(urlparse(self.path).query)
                path = urlparse(self.path).path
                fixture.requests.append(self.path)
                if path == "/uc" and fixture.flow == "direct":
                    return self._bytes()
                if path == "/uc" and fixture.flow == "cookie":
                    if q.get("confirm"):
                        return self._bytes()
                    return self._html(
                        "<html>virus scan warning, no form</html>",
                        cookie="download_warning_123=tok42; Path=/")
                if path == "/uc":  # form flow
                    return self._html(
                        '<html><form id="download-form" '
                        'action="/download" method="get">'
                        '<input type="hidden" name="id" value="FILEID">'
                        '<input type="hidden" name="export" value="download">'
                        '<input type="hidden" name="confirm" value="t">'
                        '<input type="hidden" name="uuid" value="u-1">'
                        "</form></html>")
                if path == "/download" and q.get("confirm") == ["t"] \
                        and q.get("uuid") == ["u-1"]:
                    return self._bytes()
                self.send_response(404)
                self.end_headers()

            def _bytes(self):
                self.send_response(200)
                self.send_header("Content-Type", "application/zip")
                self.end_headers()
                self.wfile.write(fixture.payload)

            def _html(self, body: str, cookie=None):
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                if cookie:
                    self.send_header("Set-Cookie", cookie)
                self.end_headers()
                self.wfile.write(body.encode())

        self.payload = payload
        self.flow = flow
        self.requests = []
        self.server = http.server.HTTPServer(("localhost", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()
        self.base = f"http://localhost:{self.server.server_port}"

    def close(self):
        self.server.shutdown()


@pytest.mark.parametrize("flow", ["direct", "form", "cookie"])
def test_gdrive_opener_flows(tmp_path, flow):
    from spcl_tpu.data.ioutils import gdrive_opener

    payload = b"PK-fake-zip-bytes" * 64
    fx = _DriveFixture(payload, flow)
    try:
        dest = tmp_path / "f.zip"
        gdrive_opener("https://drive.google.com/uc?id=FILEID", dest,
                      _base=fx.base)
        assert dest.read_bytes() == payload
        if flow != "direct":
            assert len(fx.requests) == 2, fx.requests
    finally:
        fx.close()


def test_gdrive_form_flow_relative_action_without_base(tmp_path):
    # production path: no _base override — a relative form action must be
    # resolved against the URL that served the interstitial (urljoin), not
    # passed raw to urlopen ("unknown url type")
    from spcl_tpu.data.ioutils import gdrive_opener

    payload = b"PK-fake-zip-bytes" * 64
    fx = _DriveFixture(payload, "form")
    try:
        dest = tmp_path / "f.zip"
        # no extractable file id -> the URL itself is fetched as-is
        gdrive_opener(f"{fx.base}/uc?export=download", dest)
        assert dest.read_bytes() == payload
        assert len(fx.requests) == 2, fx.requests
    finally:
        fx.close()


def test_gdrive_file_id_extraction():
    from spcl_tpu.data.ioutils import _gdrive_file_id
    assert _gdrive_file_id(
        "https://drive.google.com/uc?id=abc_DEF-123") == "abc_DEF-123"
    assert _gdrive_file_id(
        "https://drive.google.com/file/d/xYz-9/view?usp=sharing") == "xYz-9"
    assert _gdrive_file_id("https://example.com/data.zip") is None
