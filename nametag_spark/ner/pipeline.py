"""Distributed NER pipeline: tokenize / recognize as DataFrame transforms.

Design (SURVEY.md §1.3, §7): per-turn NLP is embarrassingly parallel, so the
unit of distribution is the *row* (conv_id, turn_idx, text) — never a whole
conversation — which makes mega-conversation skew a non-issue for this stage
(§7.3 risk 4). State lives only inside Arrow batches; the model is a
read-only broadcast (the Spark analogue of the reference's shared-const
model across REST worker threads, src/rest_server/nametag_service.cpp:74-76).

mapInPandas keeps everything Arrow-batched: one Python invocation per batch
(default 10k rows), one classifier matmul per stage per batch across all
sentences in the batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..tokenizer.rules import tokenize_sentences
from . import core

TOKENS_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, tok_idx int, "
    "form string, start int, length int"
)

MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, tok_start int, tok_len int, "
    "char_start int, char_len int, type string, surface string"
)


def tokenize_df(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token table with per-turn sentence/token indices and char spans
    (reference tokenizer contract, src/tokenizer/tokenizer.h:20-33)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("conv_id", "turn_idx", "sent_idx", "tok_idx", "form", "start", "length")}
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf[text_col]):
                text = text or ""
                for s_idx, sent in enumerate(tokenize_sentences(text)):
                    for t_idx, (start, length) in enumerate(sent):
                        out["conv_id"].append(conv_id)
                        out["turn_idx"].append(turn_idx)
                        out["sent_idx"].append(s_idx)
                        out["tok_idx"].append(t_idx)
                        out["form"].append(text[start : start + length])
                        out["start"].append(start)
                        out["length"].append(length)
            yield pd.DataFrame(out)

    cols = ["conv_id", "turn_idx", text_col]
    return df.select(*cols).mapInPandas(fn, schema=TOKENS_SCHEMA)


class _BatchRecognizer:
    """Executor-side batch NER: featurize per sentence (python), classify all
    pending tokens of the batch in ONE matmul per stage, decode per sentence."""

    def __init__(self, model):
        self.model = model

    def recognize_batch(self, sentences):
        """sentences: list of features.templates.Sentence (already built).
        Mutates them in place; returns list of per-sentence sorted entity
        lists [(start, length, type_name)]."""
        model = self.model
        live = [s for s in sentences if s.size > 0]
        for s in live:
            s.clear_previous_stage()
        last_best = {}
        for net in model.networks:
            pending = []
            for s in live:
                s.clear_probabilities_local_filled()
                model.templates.process_sentence(s)
                for i in range(s.size):
                    if not s.local_filled[i]:
                        pending.append((s, i))
            if pending:
                flat = []
                ptr = [0]
                for s, i in pending:
                    flat.extend(s.features[i])
                    ptr.append(len(flat))
                probs = net.scores_batch(
                    np.asarray(flat, dtype=np.int64), np.asarray(ptr, dtype=np.int64)
                )
                local, ent = core.fill_bilou_probabilities(probs)
                for r, (s, i) in enumerate(pending):
                    s.local[i] = local[r]
                    s.local_ent[i] = ent[r]
                    s.local_filled[i] = True
            for s in live:
                best, best_ent = core.viterbi_decode(s.local, s.local_ent)
                s.prev_bilou = [int(b) for b in best]
                s.prev_ent = [int(e) for e in best_ent]
                last_best[id(s)] = (best, best_ent)

        results = []
        for s in sentences:
            if s.size == 0:
                results.append([])
                continue
            best, best_ent = last_best[id(s)]
            spans = core.extract_entities(best, best_ent)
            ents = [[st, ln, self.model.entities.name(e)] for (st, ln, e) in spans]
            self.model.templates.process_entities(s, ents, self.model.entities)
            results.append(core.sort_entities([tuple(e) for e in ents]))
        return results


def recognize_df(df: DataFrame, model_dir: str, text_col: str = "text") -> DataFrame:
    """The mention table: one row per recognized entity span.

    model_dir must be visible on all executors (shared FS or spark-submit
    --files/--archives); loaded once per python worker and cached.
    """
    from ..model.model import NerModel
    from ..features.templates import Sentence

    _cache = {}

    def get_model():
        m = _cache.get(model_dir)
        if m is None:
            m = NerModel.load(model_dir)
            _cache[model_dir] = m
        return m

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_model()
        rec = _BatchRecognizer(model)
        for pdf in batches:
            # tokenize the whole batch first, building Sentence workspaces
            sent_meta = []  # (conv_id, turn_idx, sent_idx, spans, text)
            sentences = []
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf[text_col]):
                text = text or ""
                for s_idx, spans in enumerate(tokenize_sentences(text)):
                    forms = [text[a : a + b] for (a, b) in spans]
                    sentences.append(Sentence(forms))
                    sent_meta.append((conv_id, turn_idx, s_idx, spans, text))

            results = rec.recognize_batch(sentences)

            out = {
                k: []
                for k in (
                    "conv_id",
                    "turn_idx",
                    "sent_idx",
                    "tok_start",
                    "tok_len",
                    "char_start",
                    "char_len",
                    "type",
                    "surface",
                )
            }
            for (conv_id, turn_idx, s_idx, spans, text), ents in zip(sent_meta, results):
                for (tok_start, tok_len, type_name) in ents:
                    cs = spans[tok_start][0]
                    last = spans[min(tok_start + tok_len, len(spans)) - 1]
                    ce = last[0] + last[1]
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["sent_idx"].append(s_idx)
                    out["tok_start"].append(tok_start)
                    out["tok_len"].append(tok_len)
                    out["char_start"].append(cs)
                    out["char_len"].append(ce - cs)
                    out["type"].append(type_name)
                    out["surface"].append(text[cs:ce])
            yield pd.DataFrame(out)

    cols = ["conv_id", "turn_idx", text_col]
    return df.select(*cols).mapInPandas(fn, schema=MENTIONS_SCHEMA)


def recognize_local(model, texts):
    """Single-process oracle: same kernels, no Spark — used for parity tests
    (FIXTURES.md §6). Returns list of per-text mention dicts."""
    from ..features.templates import Sentence

    rec = _BatchRecognizer(model)
    out = []
    for text in texts:
        sents = tokenize_sentences(text)
        sentences = [Sentence([text[a : a + b] for (a, b) in s]) for s in sents]
        results = rec.recognize_batch(sentences)
        mentions = []
        for s_idx, (spans, ents) in enumerate(zip(sents, results)):
            for (tok_start, tok_len, type_name) in ents:
                cs = spans[tok_start][0]
                last = spans[min(tok_start + tok_len, len(spans)) - 1]
                ce = last[0] + last[1]
                mentions.append(
                    {
                        "sent_idx": s_idx,
                        "tok_start": tok_start,
                        "tok_len": tok_len,
                        "char_start": cs,
                        "char_len": ce - cs,
                        "type": type_name,
                        "surface": text[cs:ce],
                    }
                )
        out.append(mentions)
    return out
