"""REST server (S9) — reference-compatible HTTP API.

Re-expression of src/rest_server/nametag_service.cpp:

  - GET/POST /models      -> {"models": {id: ["recognize", "tokenize"]},
                              "default_model": id}   (:59-66)
  - GET/POST /recognize   -> {"model": id, "acknowledgements": [...],
                              "result": "<rendered>"}  (:102-110)
      params: model (id, or empty for the default), data (the text),
      input = untokenized | vertical (:210-230 semantics),
      output = xml | vertical | conll (:123-128)
  - GET/POST /tokenize    -> same envelope, output xml | vertical

The reference serves with its microrestd; here it's the Python stdlib
ThreadingHTTPServer — the engine part (tokenizer, NER decode, renderers)
is the same code the Spark pipeline uses, and models may be this engine's
directory format OR reference binary .ner files. For cluster-scale scoring
use recognize_df; this server is the drop-in single-node API surface.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

ACKNOWLEDGEMENT = "http://ufal.mff.cuni.cz/nametag/1#nametag_acknowledgements"


def load_model(path: str):
    """Model directory (JSON+npz) or reference binary .ner file."""
    from ..model.model import NerModel

    return NerModel.load(path)


class NametagService:
    def __init__(self, models: dict, default: str | None = None, lang: str | None = None):
        """models: {rest_id: model path or NerModel}. lang=None tokenizes
        each request with the tokenizer its MODEL implies (the reference's
        ner::new_tokenizer behavior); a string forces one grammar."""
        self.models = {}
        for rid, m in models.items():
            self.models[rid] = m if hasattr(m, "recognize_sentence") else load_model(m)
        self.default = default or next(iter(self.models))
        self.lang = lang
        self._recognizers = {}
        self._lock = threading.Lock()

    def _recognizer(self, rid: str):
        from ..ner.pipeline import _BatchRecognizer

        with self._lock:
            rec = self._recognizers.get(rid)
            if rec is None:
                rec = self._recognizers[rid] = _BatchRecognizer(self.models[rid])
            return rec

    # ------------------------------------------------------------ endpoints
    def models_json(self) -> dict:
        return {
            "models": {rid: ["recognize", "tokenize"] for rid in self.models},
            "default_model": self.default,
        }

    def _sentences(self, data: str, input_mode: str, rid: str | None = None):
        """-> (text, sent_spans, sent_forms). Vertical input: one token per
        line, blank line ends a sentence (nametag_service.cpp vertical
        tokenizer); untokenized: the model-language tokenizer."""
        from ..tokenizer.rules import tokenize_sentences

        if input_mode == "vertical":
            spans = []
            cur = []
            pos = 0
            text_parts = []
            for line in data.split("\n"):
                tok = line.rstrip("\r")
                if not tok:
                    if cur:
                        spans.append(cur)
                        cur = []
                    continue
                text_parts.append(tok)
                cur.append((pos, len(tok)))
                pos += len(tok) + 1
            if cur:
                spans.append(cur)
            text = " ".join(text_parts)
        else:
            text = data
            lang = self.lang or (
                self.models[rid].default_tokenizer_lang if rid in self.models else "en"
            )
            spans = tokenize_sentences(text, lang)
        forms = [[text[a : a + b] for (a, b) in s] for s in spans]
        return text, spans, forms

    # per-batch sentence budget: large enough that the batch recognizer's
    # flat-array machinery dominates (recognize_batch internally re-chunks
    # at 150k tokens), small enough that multi-MB documents still stream
    # fragment-by-fragment with bounded latency
    BATCH_SENTENCES = 1024

    def _decoded_batches(self, rid: str, spans, forms):
        """Lazily decode sentences in bounded batches -> yields
        (spans_i, forms_i, entities_i) per sentence, in order. Fragments
        downstream stream out while later batches are still decoding — the
        reference service's per-sentence generator shape
        (nametag_service.cpp:146-200)."""
        model = self.models[rid]
        rec = self._recognizer(rid)
        B = self.BATCH_SENTENCES
        for i in range(0, len(forms), B):
            batch = forms[i : i + B]
            sentences = model.make_sentence_batch(batch)
            entities = rec.recognize_batch(sentences)
            for j, ents in enumerate(entities):
                yield spans[i + j], batch[j], ents

    def recognize_fragments(self, rid: str, data: str, input_mode: str, output: str):
        """-> iterator of result-string fragments (one per sentence)."""
        from ..sinks.render import (
            render_conll_fragments,
            render_vertical_fragments,
            render_xml_fragments,
        )

        text, spans, forms = self._sentences(data, input_mode, rid)
        decoded = self._decoded_batches(rid, spans, forms)
        if output == "conll":
            return render_conll_fragments((f, e) for (_s, f, e) in decoded)
        if output == "vertical":
            return render_vertical_fragments((f, e) for (_s, f, e) in decoded)
        return render_xml_fragments(text, ((s, e) for (s, _f, e) in decoded))

    def recognize(self, rid: str, data: str, input_mode: str, output: str) -> str:
        return "".join(self.recognize_fragments(rid, data, input_mode, output))

    def tokenize_fragments(self, rid: str, data: str, output: str):
        from ..sinks.render import render_xml_fragments

        text, spans, forms = self._sentences(data, "untokenized", rid)
        if output == "vertical":
            # one token per line, blank line between sentences
            return ("\n".join(sent) + "\n\n" for sent in forms)
        return render_xml_fragments(text, ((s, []) for s in spans))

    def tokenize(self, rid: str, data: str, output: str) -> str:
        return "".join(self.tokenize_fragments(rid, data, output))

    def envelope(self, rid: str, result: str) -> dict:
        return {
            "model": rid,
            "acknowledgements": [ACKNOWLEDGEMENT],
            "result": result,
        }


class _Handler(BaseHTTPRequestHandler):
    service: NametagService = None  # set by serve()
    protocol_version = "HTTP/1.1"  # required for chunked transfer-encoding

    def log_message(self, *args):  # quiet
        pass

    def _params(self):
        parsed = urlparse(self.path)
        params = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
        if self.command == "POST":
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n) if n else b""
            ctype = self.headers.get("Content-Type", "")
            # dispatch on Content-Type ONLY (like the reference service):
            # sniffing the body for '=' would destroy plain-text payloads
            # such as "E=mc2"
            if "application/x-www-form-urlencoded" in ctype:
                for k, v in parse_qs(raw.decode("utf-8")).items():
                    params[k] = v[-1]
            elif "multipart/form-data" in ctype:
                # the reference's microrestd POST processor accepts
                # multipart/form-data (libmicrohttpd postprocessor); parse
                # each part's content-disposition name
                import email.parser
                import email.policy

                msg = email.parser.BytesParser(policy=email.policy.HTTP).parsebytes(
                    b"Content-Type: " + ctype.encode("utf-8") + b"\r\n\r\n" + raw
                )
                for part in msg.iter_parts():
                    name = part.get_param("name", header="content-disposition")
                    if name:
                        payload = part.get_payload(decode=True)
                        params[str(name)] = (payload or b"").decode("utf-8")
            elif raw:
                params.setdefault("data", raw.decode("utf-8"))
        return parsed.path, params

    def _respond(self, code: int, payload, mime="application/json"):
        body = (
            json.dumps(payload, ensure_ascii=False).encode("utf-8")
            if not isinstance(payload, (bytes, str))
            else (payload.encode("utf-8") if isinstance(payload, str) else payload)
        )
        self.send_response(code)
        self.send_header("Content-Type", mime)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _respond_chunked(self, rid: str, fragments):
        """Stream the JSON envelope with chunked transfer-encoding: the
        header + '"result":"' prefix first, then one chunk per sentence
        fragment (JSON string-escaped), then the closing '"}'. Mirrors the
        reference's per-sentence response generator
        (nametag_service.cpp:146-200) so multi-MB documents stream instead
        of buffering."""

        def chunk(b: bytes):
            self.wfile.write(f"{len(b):X}\r\n".encode("ascii") + b + b"\r\n")

        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        head = json.dumps(
            {"model": rid, "acknowledgements": [ACKNOWLEDGEMENT]}, ensure_ascii=False
        )
        chunk((head[:-1] + ',"result":"').encode("utf-8"))
        self.wfile.flush()
        try:
            for frag in fragments:
                if frag:
                    # json-escape, strip the surrounding quotes
                    chunk(json.dumps(frag, ensure_ascii=False)[1:-1].encode("utf-8"))
                    self.wfile.flush()
        except Exception:
            # headers + part of the chunked 200 body are already on the
            # wire: a fresh 500 status line here would corrupt the response
            # and desync the keep-alive connection. Abort the chunked stream
            # by closing the socket WITHOUT the terminating 0-chunk — the
            # client sees a truncated transfer (an unambiguous error), and
            # the connection cannot be reused for a desynced request.
            self.close_connection = True
            try:
                self.wfile.flush()
            except OSError:
                pass
            return
        chunk(b'"}')
        self.wfile.write(b"0\r\n\r\n")
        self.wfile.flush()

    def _handle(self):
        svc = self.service
        path, params = self._params()
        try:
            if path == "/models":
                return self._respond(200, svc.models_json())
            rid = params.get("model", "") or svc.default
            if rid not in svc.models:
                return self._respond(
                    404, f"Requested model '{rid}' does not exist.\n", mime="text/plain"
                )
            data = params.get("data", "")
            if path == "/recognize":
                input_mode = params.get("input", "untokenized")
                if input_mode not in ("untokenized", "vertical"):
                    return self._respond(400, "Unknown input mode.\n", mime="text/plain")
                output = params.get("output", "xml")
                if output not in ("xml", "vertical", "conll"):
                    return self._respond(400, "Unknown output mode.\n", mime="text/plain")
                return self._respond_chunked(
                    rid, svc.recognize_fragments(rid, data, input_mode, output)
                )
            if path == "/tokenize":
                output = params.get("output", "xml")
                if output not in ("xml", "vertical"):
                    return self._respond(400, "Unknown output mode.\n", mime="text/plain")
                return self._respond_chunked(rid, svc.tokenize_fragments(rid, data, output))
            return self._respond(404, "Unknown endpoint.\n", mime="text/plain")
        except Exception as exc:  # mirror respond_error
            return self._respond(500, f"{exc}\n", mime="text/plain")

    do_GET = _handle
    do_POST = _handle


def serve(service: NametagService, host: str = "127.0.0.1", port: int = 0):
    """Start a threaded HTTP server; returns (server, thread). port=0 picks
    a free port (server.server_address[1])."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    server = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
