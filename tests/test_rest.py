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
