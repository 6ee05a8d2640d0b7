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
truncates the stream to EXACTLY the prefix the reference's decoder
consumes, computed by _consumed_prefix — a transcription of the embedded
LzmaDec decode loop's consumption behavior (its post-output NORMALIZE can
consume one byte more than liblzma's minimal prefix, so a liblzma-derived
length is occasionally rejected by the reference; found via the GRU
factory round-trip). The emulation is pure Python at ~2.5s/MB of payload —
a save-time cost only, paid once per exported model.

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
        trunc = stream[: _consumed_prefix(stream, len(payload), props)]
        ulen, clen = len(payload), len(trunc)
        crc = (ulen * 19991 + clen * 199999991 + 1234567890) % (1 << 32)
        return struct.pack("<III", ulen, clen, crc) + props + trunc


def _consumed_prefix(stream: bytes, ulen: int, props: bytes) -> int:
    """EXACT number of stream bytes the reference's LZMA decoder consumes
    to produce ulen output bytes.

    The reference requires `compressed_size == compressed_len` after
    decoding with LZMA_FINISH_ANY (compressor_load.cpp:1403 /
    LzmaDecode), and its decoder performs one final NORMALIZE after the
    output is complete — so its consumption can exceed liblzma's minimal
    prefix by one byte (observed in practice), and a liblzma-derived length
    is rejected. This is a faithful transcription of the consumption
    behavior of the LzmaDec decode loop embedded in compressor_load.cpp
    (Igor Pavlov's public-domain LzmaDec.c): range-coder init (5 bytes),
    NORMALIZE before every bit decode, and the post-loop NORMALIZE."""
    lclppb = props[0]
    lc = lclppb % 9
    lp = (lclppb // 9) % 5
    pb = lclppb // 45
    kTop = 1 << 24

    n_probs = 1846 + (768 << (lc + lp))
    probs = [1024] * n_probs
    IsMatch = 0
    IsRep = IsMatch + (12 << 4)
    IsRepG0 = IsRep + 12
    IsRepG1 = IsRepG0 + 12
    IsRepG2 = IsRepG1 + 12
    IsRep0Long = IsRepG2 + 12
    PosSlot = IsRep0Long + (12 << 4)
    SpecPos = PosSlot + (4 << 6)
    Align_ = SpecPos + 128 - 14  # kNumFullDistances=1<<(kEndPosModelIndex>>1)
    LenCoder = Align_ + 16
    RepLenCoder = LenCoder + 2 + (16 << 3) + (16 << 3) + 256
    Literal = RepLenCoder + 2 + (16 << 3) + (16 << 3) + 256

    pos = 0  # consumed bytes

    def byte():
        nonlocal pos
        b = stream[pos]
        pos += 1
        return b

    # rc init: 1 ignored byte + 4 code bytes
    byte()
    code = 0
    for _ in range(4):
        code = (code << 8) | byte()
    rng = 0xFFFFFFFF

    out = bytearray()
    state = 0
    rep0 = rep1 = rep2 = rep3 = 1
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1

    def bit(idx):
        nonlocal rng, code
        ttt = probs[idx]
        if rng < kTop:
            rng = (rng << 8) & 0xFFFFFFFF
            code = ((code << 8) | byte()) & 0xFFFFFFFF
        bound = (rng >> 11) * ttt
        if code < bound:
            rng = bound
            probs[idx] = ttt + ((2048 - ttt) >> 5)
            return 0
        rng -= bound
        code -= bound
        probs[idx] = ttt - (ttt >> 5)
        return 1

    def tree(base, nbits):
        i = 1
        for _ in range(nbits):
            i = (i << 1) | bit(base + i)
        return i - (1 << nbits)

    def len_decode(base, pos_state):
        if bit(base) == 0:
            return tree(base + 2 + (pos_state << 3), 3)
        if bit(base + 1) == 0:
            return 8 + tree(base + 2 + (16 << 3) + (pos_state << 3), 3)
        return 16 + tree(base + 2 + (16 << 3) + (16 << 3), 8)

    while len(out) < ulen:
        pos_state = len(out) & pb_mask
        if bit(IsMatch + (state << 4) + pos_state) == 0:
            # literal
            prev = out[-1] if out else 0
            lit = Literal + 768 * (((len(out) & lp_mask) << lc) + (prev >> (8 - lc)))
            if state < 7:
                sym = 1
                while sym < 0x100:
                    sym = (sym << 1) | bit(lit + sym)
            else:
                match_byte = out[len(out) - rep0]
                offs = 0x100
                sym = 1
                while sym < 0x100:
                    match_byte <<= 1
                    b = match_byte & offs
                    v = bit(lit + offs + b + sym)
                    sym = (sym << 1) | v
                    if v:
                        offs &= b
                    else:
                        offs &= ~b
            out.append(sym & 0xFF)
            state = state - state if state < 4 else (state - 3 if state < 10 else state - 6)
            continue
        if bit(IsRep + state) == 0:
            # match
            length = len_decode(LenCoder, pos_state)
            state = 7 if state < 7 else 10
            slot_base = PosSlot + ((length if length < 4 else 3) << 6)
            dist = tree(slot_base, 6)
            if dist >= 4:
                slot = dist
                nbits = (slot >> 1) - 1
                dist = (2 | (slot & 1))
                if slot < 14:
                    dist <<= nbits
                    base = SpecPos + dist - slot - 1
                    mask = 1
                    i = 1
                    for _ in range(nbits):
                        v = bit(base + i)
                        i = (i << 1) | v
                        if v:
                            dist |= mask
                        mask <<= 1
                else:
                    for _ in range(nbits - 4):
                        if rng < kTop:
                            rng = (rng << 8) & 0xFFFFFFFF
                            code = ((code << 8) | byte()) & 0xFFFFFFFF
                        rng >>= 1
                        code = (code - rng) & 0xFFFFFFFF
                        if code >> 31:  # t == 0xFFFFFFFF: bit 0
                            dist = dist << 1
                            code = (code + rng) & 0xFFFFFFFF
                        else:  # t == 0: bit 1
                            dist = (dist << 1) + 1
                    base = Align_
                    i = 1
                    add = 1
                    dist <<= 4
                    for _ in range(4):
                        v = bit(base + i)
                        i = (i << 1) | v
                        if v:
                            dist |= add
                        add <<= 1
                    if dist == 0xFFFFFFFF:
                        break  # end marker (not produced for our streams)
            rep3, rep2, rep1, rep0 = rep2, rep1, rep0, dist + 1
            length += 2
            for _ in range(min(length, ulen - len(out))):
                out.append(out[len(out) - rep0])
        else:
            if bit(IsRepG0 + state) == 0:
                if bit(IsRep0Long + (state << 4) + pos_state) == 0:
                    out.append(out[len(out) - rep0])
                    state = 9 if state < 7 else 11
                    continue
            else:
                if bit(IsRepG1 + state) == 0:
                    dist = rep1
                else:
                    if bit(IsRepG2 + state) == 0:
                        dist = rep2
                    else:
                        dist = rep3
                        rep3 = rep2
                    rep2 = rep1
                rep1 = rep0
                rep0 = dist
            state = 8 if state < 7 else 11
            length = len_decode(RepLenCoder, pos_state) + 2
            for _ in range(min(length, ulen - len(out))):
                out.append(out[len(out) - rep0])

    # the post-loop NORMALIZE (this is the byte liblzma does not count)
    if rng < kTop:
        pos += 1
    return pos


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
