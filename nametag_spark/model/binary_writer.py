"""Writer for the reference's binary ``.ner`` model format.

Inverse of binary_reader (same format references; save order follows
src/ner/bilou_ner_trainer.cpp:69-74 and the per-section save methods:
entity_map_encoder.cpp, feature_templates_encoder.cpp +
feature_processor.cpp:45-57 + feature_processor_instances.cpp save
overrides, network_classifier_encoder.cpp). A model written here loads in
the reference engine (verified end-to-end against the compiled reference
run_ner in tests/test_binary_model.py).

Blob framing detail: the reference decodes raw LZMA1 with FINISH_ANY and
requires the compressed length to be consumed exactly
(compressor_load.cpp:1403). Python's lzma always terminates LZMA1 streams
with an end-of-stream marker the reference never reads, so the encoder
truncates the stream to the minimal prefix that still inflates to the full
payload (binary search over prefix length) — the decoder then stops exactly
at input end with the output complete.

Limitations (reject loudly rather than write silently-wrong files):
  - trivial tagger, or an embedded MorphoDiTa tagger (whose serialized
    stream round-trips verbatim); our own trained MorphoTagger has no
    reference encoding
  - only feature processors the reference knows (everything this engine
    implements is in that set)
"""

from __future__ import annotations

import lzma
import struct

import numpy as np

_FILTERS = [{"id": lzma.FILTER_LZMA1, "preset": 6}]

_MATCH_IDS = {"form": 0, "rawlemma": 1, "rawlemmas": 2}

NER_IDS = {"czech": 0, "english": 1, "generic": 2}


class _Encoder:
    def __init__(self):
        self.parts: list = []

    def u1(self, v: int):
        self.parts.append(struct.pack("<B", v))

    def u2(self, v: int):
        self.parts.append(struct.pack("<H", v))

    def u4(self, v: int):
        self.parts.append(struct.pack("<I", v & 0xFFFFFFFF))

    def f8(self, v: float):
        self.parts.append(struct.pack("<d", v))

    def s(self, text: str):
        b = text.encode("utf-8")
        if len(b) < 255:
            self.u1(len(b))
        else:
            self.u1(255)
            self.u4(len(b))
        self.parts.append(b)

    def raw(self, b: bytes):
        self.parts.append(b)

    def blob(self) -> bytes:
        """compressor::save-compatible framing of the accumulated payload."""
        payload = b"".join(self.parts)
        comp = lzma.compress(payload, format=lzma.FORMAT_ALONE, filters=_FILTERS)
        props, stream = comp[:5], comp[13:]
        trunc = stream[: _consumed_prefix(stream, len(payload))]
        ulen, clen = len(payload), len(trunc)
        crc = (ulen * 19991 + clen * 199999991 + 1234567890) % (1 << 32)
        return struct.pack("<III", ulen, clen, crc) + props + trunc


def _consumed_prefix(stream: bytes, ulen: int) -> int:
    """Minimal prefix of the raw LZMA1 stream that inflates to ulen bytes."""

    def full(n: int) -> bool:
        d = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=_FILTERS)
        try:
            out = d.decompress(stream[:n], max_length=ulen)
        except lzma.LZMAError:
            return False
        return len(out) >= ulen

    lo, hi = 0, len(stream)
    while lo < hi:
        mid = (lo + hi) // 2
        if full(mid):
            hi = mid
        else:
            lo = mid + 1
    return lo


def _write_base(e: _Encoder, proc) -> None:
    e.u4(proc.window)
    e.u4(max(1, len(proc.map)))  # bucket-count hint
    e.u4(len(proc.map))
    for key in sorted(proc.map):
        e.s(key)
        e.u4(proc.map[key])


def _write_processor(e: _Encoder, proc) -> None:
    name = proc.name
    if name == "CzechAddContainers":
        return  # empty save (feature_processor_instances.cpp:182)
    _write_base(e, proc)
    if name == "BrownClusters":
        e.u4(len(proc.clusters))
        for cluster in proc.clusters:
            e.u4(len(cluster))
            for feature in cluster:
                e.u4(feature)
    elif name == "Gazetteers":
        e.u4(len(proc.info))
        for info in proc.info:
            e.u1(1 if info["prefix_of_longer"] else 0)
            e.u1(len(info["features"]))
            for feature in info["features"]:
                e.u4(feature)
    elif name == "GazetteersEnhanced":
        e.u4(_MATCH_IDS[proc.match])
        e.u4(len(proc.metas))
        for meta in proc.metas:
            e.s(meta["basename"])
            e.u4(meta["feature"])
            e.u4(meta["entity"])
        e.u4(len(proc.lists))
        for lst in proc.lists:
            e.u4(len(lst["gazetteers"]))
            for gaz in lst["gazetteers"]:
                e.s(gaz)
            e.u4(lst["feature"])
            e.u4(lst["entity"])
            e.u4(lst["mode"])
        e.u4(len(proc.entity_list))
        for ent in proc.entity_list:
            e.s(ent)
    elif name in (
        "FormSuffix",
        "FormCaseNormalizedSuffix",
        "RawLemmaSuffix",
        "RawLemmaCaseNormalizedSuffix",
    ):
        e.u4(proc.shortest)
        e.u4(proc.longest)
    elif name == "URLEmailDetector":
        e.u4(proc.url)
        e.u4(proc.email)


def _write_network(net) -> bytes:
    e = _Encoder()
    n_features, n_out = net.w_adj.shape
    rows = []
    for f in range(n_features):
        idx = np.nonzero(net.mask[f])[0].astype(np.uint32)
        w = (net.w_adj[f, idx] + net.missing_weight).astype(np.float32)
        rows.append((idx, w))
    e.u4(n_features)
    for idx, _w in rows:
        e.u2(len(idx))
        e.raw(idx.tobytes())
    e.f8(net.missing_weight)
    e.u4(n_features)
    for _idx, w in rows:
        e.u2(len(w))
        e.raw(w.tobytes())
    if net.hidden_w0 is not None:
        n_hidden = net.hidden_w0.shape[1]
        e.u2(n_hidden)
        for mat in (net.hidden_w0, net.hidden_w1):
            e.u4(mat.shape[0])
            for row in mat:
                e.u2(len(row))
                e.raw(row.astype(np.float32).tobytes())
    else:
        e.u2(0)
    e.u2(n_out)
    return e.blob()


def save_binary_ner(model, path: str, ner_id: str = None) -> None:
    """Write a NerModel as a reference-loadable .ner file. ner_id defaults
    to the model's own ner_lang (round-trips the dispatch byte), falling
    back to "english"."""
    if ner_id is None:
        ner_id = getattr(model, "ner_lang", None) or "english"
    tagger_blob = None
    if model.tagger is not None:
        # a MorphoDiTa tagger round-trips: its serialized stream is kept
        # verbatim at load (morphodita_tagger.cpp:27-38 embeds the whole
        # .tagger file), so writing is a passthrough. Other tagger kinds
        # (our own trained MorphoTagger) have no reference encoding.
        tagger_blob = getattr(model.tagger, "raw_bytes", None)
        if tagger_blob is None:
            raise ValueError(
                "cannot encode this tagger kind into the reference format "
                "(only embedded MorphoDiTa streams round-trip); save() the "
                "directory format instead"
            )
    with open(path, "wb") as f:
        f.write(bytes([NER_IDS[ner_id]]))
        if tagger_blob is None:
            f.write(bytes([0]))  # TRIVIAL tagger, no payload
        else:
            f.write(bytes([2]))  # MORPHODITA (tagger_ids.h)
            f.write(tagger_blob)

        e = _Encoder()
        e.u4(len(model.entities.id2str))
        for name in model.entities.id2str:
            e.s(name)
        f.write(e.blob())

        e = _Encoder()
        e.u4(model.templates.total.value)
        e.u4(len(model.templates.processors))
        for proc in model.templates.processors:
            e.s(proc.name)
            _write_processor(e, proc)
        f.write(e.blob())

        f.write(bytes([len(model.networks)]))
        for net in model.networks:
            f.write(_write_network(net))
