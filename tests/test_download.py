"""Download helpers: webdav mirror driven against a local in-process
server (the reference shells out to recursive wget over the same
protocol, bm/studies/download.py:56-76)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from brainmagick_tpu.studies import download as dl

# remote tree: collections end with "/", files map to bytes
TREE = {
    "/dccn/DSC_3011020.09_236/": ["sub-A2002/", "stimuli.txt",
                                  "index.html"],
    "/dccn/DSC_3011020.09_236/sub-A2002/": ["meg/", "events.tsv"],
    "/dccn/DSC_3011020.09_236/sub-A2002/meg/": ["data.bin"],
}
FILES = {
    "/dccn/DSC_3011020.09_236/stimuli.txt": b"stimuli",
    "/dccn/DSC_3011020.09_236/index.html": b"<html>listing</html>",
    "/dccn/DSC_3011020.09_236/sub-A2002/events.tsv": b"onset\t0.1\n",
    "/dccn/DSC_3011020.09_236/sub-A2002/meg/data.bin": b"\x00" * 64,
}


class _DavHandler(BaseHTTPRequestHandler):
    def _authorized(self):
        # base64("alice:s3cret")
        return self.headers.get("Authorization") == \
            "Basic YWxpY2U6czNjcmV0"

    def do_PROPFIND(self):  # noqa: N802 (http.server naming)
        if not self._authorized():
            self.send_response(401)
            self.end_headers()
            return
        path = self.path if self.path.endswith("/") else self.path + "/"
        if path not in TREE:
            self.send_response(404)
            self.end_headers()
            return
        parts = [_response(path, is_dir=True)]
        for child in TREE[path]:
            parts.append(_response(path + child,
                                   is_dir=child.endswith("/")))
        body = ('<?xml version="1.0"?><D:multistatus xmlns:D="DAV:">'
                + "".join(parts) + "</D:multistatus>").encode()
        self.send_response(207)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if not self._authorized():
            self.send_response(401)
            self.end_headers()
            return
        data = FILES.get(self.path)
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


def _response(href: str, is_dir: bool) -> str:
    rtype = "<D:collection/>" if is_dir else ""
    return (f"<D:response><D:href>{href}</D:href><D:propstat><D:prop>"
            f"<D:resourcetype>{rtype}</D:resourcetype></D:prop>"
            "<D:status>HTTP/1.1 200 OK</D:status></D:propstat>"
            "</D:response>")


@pytest.fixture()
def dav_server():
    server = HTTPServer(("127.0.0.1", 0), _DavHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    thread.join()


def test_download_donders_mirrors_tree(dav_server, tmp_path):
    dest = tmp_path / "schoffelen2019"
    dl.download_donders("DSC_3011020.09_236", dest, parent="dccn",
                        user="alice", password="s3cret",
                        base_url=dav_server)
    root = dest / "download"
    assert (root / "stimuli.txt").read_bytes() == b"stimuli"
    assert (root / "sub-A2002" / "events.tsv").read_bytes() == \
        b"onset\t0.1\n"
    assert (root / "sub-A2002" / "meg" / "data.bin").stat().st_size == 64
    # wget-style listing exclusion
    assert not (root / "index.html").exists()
    assert (root / "success.txt").exists()
    # idempotent: marker short-circuits (bad creds would otherwise fail)
    dl.download_donders("DSC_3011020.09_236", dest, parent="dccn",
                        user="wrong", password="wrong",
                        base_url=dav_server)


def test_download_donders_requires_credentials(tmp_path, monkeypatch):
    monkeypatch.delenv("DONDERS_USER", raising=False)
    monkeypatch.delenv("DONDERS_PASSWORD", raising=False)
    with pytest.raises(dl.DownloadError, match="credentials"):
        dl.download_donders("DSC_x", tmp_path / "x")
