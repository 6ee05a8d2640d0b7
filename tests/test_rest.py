"""S9 REST server: reference-compatible API over the engine kernels,
serving a REFERENCE-format binary model."""

import json
import os
import sys
import urllib.parse
import urllib.request

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nametag_spark.rest.server import NametagService, serve

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "tiny_ref.ner")


@pytest.fixture(scope="module")
def rest_url():
    svc = NametagService({"tiny-ref-140101": FIXTURE})
    server, _thread = serve(svc)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()


def _get(url, path, **params):
    q = urllib.parse.urlencode(params)
    with urllib.request.urlopen(f"{url}{path}?{q}") as r:
        return json.loads(r.read().decode("utf-8"))


def test_models_endpoint(rest_url):
    got = _get(rest_url, "/models")
    assert got == {
        "models": {"tiny-ref-140101": ["recognize", "tokenize"]},
        "default_model": "tiny-ref-140101",
    }


def test_recognize_vertical_matches_reference_decode(rest_url):
    """vertical-in/vertical-out on the same sentences as the binary-model
    parity fixture: the result must equal the reference run_ner output
    (same global-token-id format)."""
    data = "Alice\nJohnson\nworks\nat\nAcme\nCorp\nin\nPrague\n.\n\nBob\nvisited\nLondon\n.\n"
    got = _get(rest_url, "/recognize", data=data, input="vertical", output="vertical")
    assert got["model"] == "tiny-ref-140101"
    assert got["acknowledgements"]
    assert got["result"].splitlines() == [
        "1,2\tPER\tAlice Johnson",
        "5,6\tORG\tAcme Corp",
        "8\tLOC\tPrague",
        "11\tPER\tBob",
        "13\tLOC\tLondon",
    ]


def test_recognize_untokenized_xml(rest_url):
    got = _get(rest_url, "/recognize", data="Eve flew to New York.", output="xml")
    assert '<ne type="LOC"><token>New</token> <token>York</token></ne>' in got["result"]
    assert got["result"].startswith("<sentence>")


def test_recognize_conll_post(rest_url):
    body = urllib.parse.urlencode(
        {"data": "Bob visited London.", "output": "conll"}
    ).encode()
    req = urllib.request.Request(f"{rest_url}/recognize", data=body, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read().decode("utf-8"))
    lines = got["result"].splitlines()
    assert lines[0] == "Bob\tB-PER"
    assert lines[2] == "London\tB-LOC"


def test_tokenize_vertical(rest_url):
    got = _get(rest_url, "/tokenize", data="Hello world. Bye.", output="vertical")
    assert got["result"].splitlines() == ["Hello", "world", ".", "", "Bye", ".", ""]


def test_unknown_model_404(rest_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(rest_url, "/recognize", model="nope", data="x")
    assert e.value.code == 404


def test_model_alias_resolution():
    """The reference strips '-<6 digits>' version suffixes and '-...' tails
    for aliases (nametag_service.cpp:41-53) — mirror the useful part: exact
    id and the empty id (default) both resolve."""
    svc = NametagService({"tiny-ref-140101": FIXTURE})
    assert "tiny-ref-140101" in svc.models
    assert svc.default == "tiny-ref-140101"


def test_chunked_streaming_incremental(rest_url):
    """The reference streams one JSON fragment per sentence
    (nametag_service.cpp:146-200). Assert (a) the response uses chunked
    transfer-encoding with multiple result chunks, (b) the first sentence's
    fragment is on the wire BEFORE the server finishes the document, and
    (c) the assembled stream equals the buffered result."""
    import socket
    import urllib.parse

    n_sents = 40
    # vertical input: sentences separated by blank lines
    data = "Alice\nJohnson\nworks\n.\n\n" * n_sents
    body = urllib.parse.urlencode(
        {"data": data, "input": "vertical", "output": "vertical"}
    ).encode()

    host, port = rest_url.replace("http://", "").split(":")
    s = socket.create_connection((host, int(port)), timeout=30)
    s.sendall(
        b"POST /recognize HTTP/1.1\r\nHost: x\r\n"
        b"Content-Type: application/x-www-form-urlencoded\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    raw = b""
    saw_fragment_before_terminator = False
    while b"0\r\n\r\n" not in raw:
        got = s.recv(65536)
        assert got, "connection closed before terminator"
        raw += got
        if b"PER\\tAlice Johnson" in raw and b"0\r\n\r\n" not in raw:
            # a sentence fragment is on the wire while the stream is open
            saw_fragment_before_terminator = True
    s.close()
    assert saw_fragment_before_terminator

    headers, _, payload = raw.partition(b"\r\n\r\n")
    assert b"Transfer-Encoding: chunked" in headers
    # count chunks: each "<hex>\r\n" size line
    chunks = []
    rest = payload
    while rest:
        size_line, _, rest = rest.partition(b"\r\n")
        size = int(size_line, 16)
        if size == 0:
            break
        chunks.append(rest[:size])
        rest = rest[size + 2 :]
    assert len(chunks) >= n_sents  # one fragment per sentence + head + tail
    assembled = json.loads(b"".join(chunks).decode("utf-8"))
    buffered = _get(rest_url, "/recognize", data=data, input="vertical", output="vertical")
    assert assembled == buffered


def test_multipart_post(rest_url):
    """multipart/form-data POST (the reference's microrestd accepts it)."""
    boundary = "xXbndXx"
    def part(name, value):
        return (f"--{boundary}\r\nContent-Disposition: form-data; name=\"{name}\"\r\n\r\n{value}\r\n")
    body = (part("data", "Alice\nJohnson\n.\n") + part("input", "vertical")
            + part("output", "vertical") + f"--{boundary}--\r\n").encode("utf-8")
    req = urllib.request.Request(
        f"{rest_url}/recognize", data=body, method="POST",
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read().decode("utf-8"))
    assert got["result"].splitlines() == ["1,2\tPER\tAlice Johnson"]


def test_midstream_error_aborts_chunked_response():
    """An exception AFTER the chunked 200 header is on the wire must abort
    the stream (truncated chunked transfer, connection closed) — never a
    fresh 500 status line spliced into the 200 body, which would desync
    HTTP keep-alive."""
    import http.client

    svc = NametagService({"m": FIXTURE})

    def exploding_fragments(rid, data, input_mode, output):
        def gen():
            yield "first fragment"
            raise RuntimeError("decode blew up mid-stream")

        return gen()

    svc.recognize_fragments = exploding_fragments
    server, _thread = serve(svc)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.server_address[1])
        conn.request("GET", "/recognize?data=hello")
        resp = conn.getresponse()
        assert resp.status == 200  # headers were already committed
        with pytest.raises(http.client.IncompleteRead):
            resp.read()  # truncated chunked body, no terminating 0-chunk
        conn.close()
    finally:
        server.shutdown()
