"""Reader for the reference's binary ``.ner`` model format.

Re-expression of the load path (no code shared with the reference; the
format was studied from):
  - dispatch byte:            src/ner/ner.cpp:20-34 (ner_id)
  - section order:            src/ner/bilou_ner.cpp:21-35
      tagger_id byte + tagger payload, entity map, feature templates,
      stages byte, one network per stage
  - blob framing:             src/utils/compressor_load.cpp:1387-1406
      uncompressed_len u32, compressed_len u32,
      poor_crc u32 (= ulen*19991 + clen*199999991 + 1234567890),
      5 LZMA props bytes, raw LZMA1 stream
      (decoded here with Python's lzma in FORMAT_ALONE by prepending the
      13-byte lzma_alone header: props + u64 uncompressed size)
  - primitives:               src/utils/binary_decoder.h
      u8/u16/u32 little-endian; str = u8 len (255 -> u32 len) + bytes
  - entity map:               src/ner/entity_map.cpp:30-46
  - templates:                src/features/feature_templates.cpp:17-45
      total_features u32, count u32, then per processor: name str +
      base load (window u32, bucket_count u32, map size u32,
      (key str, feature u32) pairs; feature_processor.cpp:33-43) +
      per-processor payloads (feature_processor_instances.cpp)
  - network:                  src/classifier/network_classifier.cpp:22-60
      indices matrix (u32), missing_weight f64, weights matrix (f32),
      hidden size u16 (+ two f32 matrices when nonzero), outcomes u16;
      a matrix = rows u32, then per row: cols u16 + payload
      (propagate semantics network_classifier.cpp:180-210 map onto our
      adjusted-weight representation W_adj[f,o] = w - missing_weight)

Supported taggers: TRIVIAL and EXTERNAL (no payload), and MORPHODITA —
the embedded MorphoDiTa tagger stream is parsed by
nametag_spark.morpho.morphodita (dictionary + guesser + perceptron feature
sequences + Viterbi) with golden-checked output parity vs the compiled
reference.
"""

from __future__ import annotations

import io
import lzma
import struct

import numpy as np

NER_IDS = {0: "czech", 1: "english", 2: "generic"}
TAGGER_TRIVIAL, TAGGER_EXTERNAL, TAGGER_MORPHODITA = 0, 1, 2

_MATCH_NAMES = {0: "form", 1: "rawlemma", 2: "rawlemmas"}


class BinaryFormatError(ValueError):
    pass


class _Decoder:
    """binary_decoder.h primitives over one decompressed blob."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u1(self) -> int:
        if self.pos + 1 > len(self.data):
            raise BinaryFormatError("no more data")
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u2(self) -> int:
        v = struct.unpack_from("<H", self.data, self.pos)[0]
        self.pos += 2
        return v

    def u4(self) -> int:
        v = struct.unpack_from("<I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def f8(self) -> float:
        v = struct.unpack_from("<d", self.data, self.pos)[0]
        self.pos += 8
        return v

    def s(self) -> str:
        n = self.u1()
        if n == 255:
            n = self.u4()
        v = self.data[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return v

    def raw(self, n: int) -> bytes:
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def is_end(self) -> bool:
        return self.pos >= len(self.data)


def _read_blob(f) -> _Decoder:
    """compressor::load framing -> decompressed _Decoder."""
    hdr = f.read(12)
    if len(hdr) != 12:
        raise BinaryFormatError("truncated blob header")
    ulen, clen, crc = struct.unpack("<III", hdr)
    if crc != (ulen * 19991 + clen * 199999991 + 1234567890) % (1 << 32):
        raise BinaryFormatError("blob checksum mismatch")
    props = f.read(5)
    compressed = f.read(clen)
    if len(props) != 5 or len(compressed) != clen:
        raise BinaryFormatError("truncated blob body")
    # raw LZMA1 with parameters from the 5 props bytes; decode exactly ulen
    # output bytes — tolerates both marker-terminated streams (reference
    # writer) and marker-less truncated streams (binary_writer.py)
    lclppb = props[0]
    lc = lclppb % 9
    lp = (lclppb // 9) % 5
    pb = lclppb // 45
    dict_size = struct.unpack("<I", props[1:5])[0]
    filt = [
        {
            "id": lzma.FILTER_LZMA1,
            "dict_size": max(4096, dict_size),
            "lc": lc,
            "lp": lp,
            "pb": pb,
        }
    ]
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filt)
    data = dec.decompress(compressed, max_length=ulen)
    if len(data) != ulen:
        raise BinaryFormatError("decompressed length mismatch")
    return _Decoder(data)


def _read_base(d: _Decoder) -> dict:
    window = d.u4()
    d.u4()  # bucket_count hint — irrelevant for a Python dict
    fmap = {}
    for _ in range(d.u4()):
        key = d.s()
        fmap[key] = d.u4()
    return {"window": window, "args": [], "map": fmap}


def _read_matrix(d: _Decoder, fmt: str, size: int):
    rows = d.u4()
    out = []
    for _ in range(rows):
        cols = d.u2()
        out.append(np.frombuffer(d.raw(cols * size), dtype=fmt).copy())
    return out


def _read_processor(name: str, d: _Decoder) -> dict:
    """Per-processor payloads (feature_processor_instances.cpp)."""
    if name == "CzechAddContainers":
        return {"window": 0, "args": [], "map": {}}  # empty load (line 181)
    st = _read_base(d)
    if name == "BrownClusters":
        clusters = []
        for _ in range(d.u4()):
            clusters.append([d.u4() for _ in range(d.u4())])
        st["clusters"] = clusters
    elif name == "Gazetteers":
        info = []
        for _ in range(d.u4()):
            prefix_of_longer = bool(d.u1())
            features = [d.u4() for _ in range(d.u1())]
            info.append({"features": features, "prefix_of_longer": prefix_of_longer})
        st["info"] = info
    elif name == "GazetteersEnhanced":
        st["match"] = _MATCH_NAMES[d.u4()]
        metas = []
        for _ in range(d.u4()):
            basename = d.s()
            feature = d.u4()
            entity = _signed(d.u4())
            metas.append({"basename": basename, "feature": feature, "entity": entity})
        lists = []
        for _ in range(d.u4()):
            gazetteers = [d.s() for _ in range(d.u4())]
            feature = d.u4()
            entity = _signed(d.u4())
            mode = d.u4()
            lists.append(
                {"gazetteers": gazetteers, "feature": feature, "entity": entity, "mode": mode}
            )
        entity_list = [d.s() for _ in range(d.u4())]
        st["metas"] = metas
        st["lists"] = lists
        st["entity_list"] = entity_list
    elif name in ("FormSuffix", "FormCaseNormalizedSuffix", "RawLemmaSuffix", "RawLemmaCaseNormalizedSuffix"):
        st["shortest"] = d.u4()
        st["longest"] = d.u4()
    elif name == "URLEmailDetector":
        st["url"] = d.u4()
        st["email"] = d.u4()
    return st


def _signed(v: int) -> int:
    """entity_type_unknown is ~0u in the reference; our code uses -1."""
    return v - (1 << 32) if v >= (1 << 31) else v


def _read_network(f):
    from ..ner import core

    d = _read_blob(f)
    indices = _read_matrix(d, "<u4", 4)
    missing_weight = d.f8()
    weights = _read_matrix(d, "<f4", 4)
    n_hidden = d.u2()
    h0 = h1 = None
    if n_hidden:
        h0_rows = _read_matrix(d, "<f4", 4)
        h1_rows = _read_matrix(d, "<f4", 4)
        h0 = np.array(h0_rows, dtype=np.float64)
        h1 = np.array(h1_rows, dtype=np.float64)
    n_out = d.u2()
    if not d.is_end():
        raise BinaryFormatError("trailing data in network blob")

    n_features = len(indices)
    w_adj = np.zeros((n_features, n_out), dtype=np.float64)
    mask = np.zeros((n_features, n_out), dtype=bool)
    for fidx, (idx_row, w_row) in enumerate(zip(indices, weights)):
        if len(idx_row):
            w_adj[fidx, idx_row] = w_row.astype(np.float64) - missing_weight
            mask[fidx, idx_row] = True
    return core.Network(w_adj, mask, missing_weight, h0, h1)


def load_binary_ner(path_or_stream):
    """Parse a reference ``.ner`` file into a nametag_spark NerModel."""
    from ..features.templates import EntityMap, FeatureTemplates, _FACTORY, _Total
    from .model import NerModel

    if isinstance(path_or_stream, (str, bytes)):
        f = open(path_or_stream, "rb")
        close = True
    else:
        f, close = path_or_stream, False
    try:
        ner_id = f.read(1)
        if not ner_id or ner_id[0] not in NER_IDS:
            raise BinaryFormatError(f"unknown ner id {ner_id!r}")

        tagger_id = f.read(1)[0]
        tagger = None
        if tagger_id == TAGGER_MORPHODITA:
            # the payload is an entire MorphoDiTa .tagger file embedded
            # verbatim (morphodita_tagger.cpp:27-38); load_stream consumes
            # exactly its bytes
            from ..morpho.morphodita import MorphoditaTagger

            tagger = MorphoditaTagger.load_stream(f)
        elif tagger_id not in (TAGGER_TRIVIAL, TAGGER_EXTERNAL):
            raise BinaryFormatError(f"unknown tagger id {tagger_id}")
        # TRIVIAL and EXTERNAL taggers have no payload (trivial_tagger.cpp:15,
        # external_tagger.cpp load is empty too)

        # entity map (entity_map.cpp:30-46)
        d = _read_blob(f)
        id2str = [d.s() for _ in range(d.u4())]
        entities = EntityMap(id2str)

        # feature templates (feature_templates.cpp:17-45)
        d = _read_blob(f)
        total_features = d.u4()
        templates = FeatureTemplates()
        templates.total = _Total(total_features)
        for _ in range(d.u4()):
            name = d.s()
            if name not in _FACTORY:
                raise BinaryFormatError(f"unsupported feature processor {name!r}")
            st = _read_processor(name, d)
            proc = _FACTORY[name]()
            proc.load_state(st, base_dir="")
            templates.processors.append(proc)
        if not d.is_end():
            raise BinaryFormatError("trailing data in templates blob")

        # stage networks
        stages = f.read(1)
        if not stages:
            raise BinaryFormatError("missing stages byte")
        networks = [_read_network(f) for _ in range(stages[0])]
        return NerModel(entities, templates, networks, tagger,
                        ner_lang=NER_IDS[ner_id[0]])
    finally:
        if close:
            f.close()
