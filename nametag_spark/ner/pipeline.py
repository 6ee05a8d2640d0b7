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

T_ENTITY_UNKNOWN = core.ENTITY_UNKNOWN

TOKENS_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, tok_idx int, "
    "form string, start int, length int"
)

MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, tok_start int, tok_len int, "
    "char_start int, char_len int, type string, surface string"
)


def tokenize_df(df: DataFrame, text_col: str = "text", lang: str = "en") -> DataFrame:
    """Token table with per-turn sentence/token indices and char spans
    (reference tokenizer contract, src/tokenizer/tokenizer.h:20-33).
    lang selects the grammar: 'en' (english_tokenizer.rl), 'cs'
    (czech_tokenizer.rl), or 'generic'."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("conv_id", "turn_idx", "sent_idx", "tok_idx", "form", "start", "length")}
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf[text_col]):
                text = text or ""
                for s_idx, sent in enumerate(tokenize_sentences(text, lang)):
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
    """Executor-side batch NER: featurize per sentence, classify all tokens
    of the batch in ONE matmul per stage, decode per sentence.

    use_fast=True routes featurization through ner.fast.FastFeaturizer (the
    vectorized physical plan); False uses the reference-shaped slow path in
    features.templates. Both produce identical results (parity-tested)."""

    def __init__(self, model, use_fast: bool = True):
        self.model = model
        self.use_fast = use_fast
        if use_fast:
            from .fast import FastFeaturizer, StagePartialScorer

            self.fast = FastFeaturizer(model)
            if not self.fast.supported:
                self.use_fast = use_fast = False  # unknown processor -> slow path
            else:
                self.scorers = [StagePartialScorer(self.fast, net) for net in model.networks]

    def _stage_fast(self, live, scorer, batch, prev_b, prev_e):
        """One stage over the whole batch with FLAT arrays: every sentence's
        local/local_ent/local_filled are numpy VIEWS into batch-wide arrays,
        so pins write through and there is no per-sentence copy-back.
        Returns (local, local_ent) flat (total, 5) arrays."""
        _codes, _uniques, sent_start, _lo, _hi = batch
        total = int(sent_start[-1])
        local = np.zeros((total, 5), dtype=np.float64)
        local_ent = np.full((total, 5), T_ENTITY_UNKNOWN, dtype=np.int64)
        filled = np.zeros(total, dtype=bool)
        has_complex = bool(self.fast.pin_procs)
        for k, s in enumerate(live):
            a = sent_start[k]
            b = sent_start[k + 1]
            s.local = local[a:b]
            s.local_ent = local_ent[a:b]
            s.local_filled = filled[a:b]
            # gazetteer soft-feature appends land here on the FIRST stage
            # only (later stages replay the _pins_memo snapshot)
            s.features = (
                [[] for _ in range(s.size)]
                if has_complex and getattr(s, "_pins_memo", None) is None
                else None
            )
            self.fast.apply_pins(s)
        probs = scorer.score(live, batch=batch, prev_b=prev_b, prev_e=prev_e)
        local_all, ent_all = core.fill_bilou_probabilities(probs)
        if filled.any():
            keep = ~filled
            local[keep] = local_all[keep]
            local_ent[keep] = ent_all[keep]
        else:
            local = local_all
            local_ent = ent_all
        filled[:] = True
        return local, local_ent

    def _stage_slow(self, live, net):
        pending = []
        for s in live:
            s.clear_probabilities_local_filled()
            self.model.templates.process_sentence(s)
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

    # cap tokens per internal batch: bounds featurizer transients (each
    # token expands to ~50-100 events; 150k tokens ~= 10-15M event rows)
    _CHUNK_TOKENS = 150_000

    def recognize_batch(self, sentences):
        """sentences: list of features.templates.Sentence (already built).
        Mutates them in place; returns list of per-sentence sorted entity
        lists [(start, length, type_name)]. Large inputs are processed in
        bounded-token chunks (per-sentence state is independent)."""
        total = 0
        for s in sentences:
            total += s.size
        if total > self._CHUNK_TOKENS and len(sentences) > 1:
            results = []
            cur = []
            cur_tok = 0
            for s in sentences:
                if cur and cur_tok + s.size > self._CHUNK_TOKENS:
                    results.extend(self.recognize_batch(cur))
                    cur = []
                    cur_tok = 0
                cur.append(s)
                cur_tok += s.size
            if cur:
                results.extend(self.recognize_batch(cur))
            return results
        model = self.model
        live = [s for s in sentences if s.size > 0]
        if not self.use_fast:
            # slow path reads per-sentence prev_bilou/prev_ent during stage 0
            # (PreviousStage.process_sentence); fast scorers take the flat
            # arrays instead, so fresh lists would be dead allocations
            for s in live:
                s.clear_previous_stage()
        last_best = {}
        # tagged sentences (external analyses or a model morpho tagger,
        # trained or not) stay on the fast path: the featurizer keys its
        # caches on the full (form, raw_lemma, lemma_id, tag, comments)
        # tuple, so per-token morphology is represented exactly
        use_fast = self.use_fast
        if use_fast and live:
            import pandas as pd

            # stage-invariant batch geometry + factorized token keys,
            # computed ONCE and shared by every stage's scorer
            lengths = np.array([s.size for s in live], dtype=np.int64)
            sent_start = np.zeros(len(live) + 1, dtype=np.int64)
            np.cumsum(lengths, out=sent_start[1:])
            tot = int(sent_start[-1])
            forms_all = []
            for s in live:
                forms_all.extend(self.fast._token_keys(s))
            keys_arr = np.empty(len(forms_all), dtype=object)
            keys_arr[:] = forms_all
            codes, uniques = pd.factorize(keys_arr)
            tok_sent = np.repeat(np.arange(len(live), dtype=np.int64), lengths)
            lo = sent_start[:-1][tok_sent]
            hi = sent_start[1:][tok_sent]
            batch = (codes, uniques, sent_start, lo, hi)

            best_cat = bent_cat = None
            if self.fast.batch_pins_ok:
                # fully-batched pin path: pin effects are stage-invariant,
                # computed ONCE over flat arrays (dead tokens skipped via the
                # factorized key tables) and scattered over each stage's
                # scored output — no per-sentence view setup at all
                if self.fast.pin_procs:
                    soft_pos, soft_fid, fill_idx, fill_rows, fill_ents = (
                        self.fast.pins_batch(live, batch)
                    )
                else:
                    soft_pos = soft_fid = fill_idx = np.empty(0, dtype=np.int64)
                    fill_rows = fill_ents = None
                for stage, net in enumerate(model.networks):
                    probs = self.scorers[stage].score(
                        live, batch=batch, prev_b=best_cat, prev_e=bent_cat,
                        soft_flat=(soft_pos, soft_fid),
                    )
                    local, local_ent = core.fill_bilou_probabilities(probs)
                    if len(fill_idx):
                        local[fill_idx] = fill_rows
                        local_ent[fill_idx] = fill_ents
                    best_cat, bent_cat = core.viterbi_decode_batch(local, local_ent, lengths)
            else:
                for stage, net in enumerate(model.networks):
                    local, local_ent = self._stage_fast(
                        live, self.scorers[stage], batch, best_cat, bent_cat
                    )
                    best_cat, bent_cat = core.viterbi_decode_batch(local, local_ent, lengths)
            for k, s in enumerate(live):
                a, b = sent_start[k], sent_start[k + 1]
                best = best_cat[a:b]
                best_ent = bent_cat[a:b]
                # numpy views: list-like for any downstream reader
                s.prev_bilou = best
                s.prev_ent = best_ent
                last_best[id(s)] = (best, best_ent)
        elif not use_fast:
            for stage, net in enumerate(model.networks):
                self._stage_slow(live, net)
                for s in live:
                    best, best_ent = core.viterbi_decode(s.local, s.local_ent)
                    s.prev_bilou = [int(b) for b in best]
                    s.prev_ent = [int(e) for e in best_ent]
                    last_best[id(s)] = (best, best_ent)

        results = []
        name = self.model.entities.name
        templates = self.model.templates
        entities = self.model.entities
        if use_fast and live:
            # one flat pass over B/U candidates instead of per-sentence scans
            spans_per = core.extract_entities_batch(best_cat, bent_cat, sent_start)
            li = 0
            for s in sentences:
                if s.size == 0:
                    results.append([])
                    continue
                spans = spans_per[li]
                li += 1
                ents = [[st, ln, name(e)] for (st, ln, e) in spans]
                templates.process_entities(s, ents, entities)
                results.append(core.sort_entities([tuple(e) for e in ents]))
        else:
            for s in sentences:
                if s.size == 0:
                    results.append([])
                    continue
                best, best_ent = last_best[id(s)]
                spans = core.extract_entities(best, best_ent)
                ents = [[st, ln, name(e)] for (st, ln, e) in spans]
                templates.process_entities(s, ents, entities)
                results.append(core.sort_entities([tuple(e) for e in ents]))
        return results


def recognize_df(
    df: DataFrame,
    model_dir: str,
    text_col: str = "text",
    passthrough: tuple = (),
    lang: str | None = None,
) -> DataFrame:
    """The mention table: one row per recognized entity span.

    model_dir must be visible on all executors (shared FS or spark-submit
    --files/--archives); loaded once per python worker and cached.

    lang: tokenizer grammar override. Default None selects the tokenizer
    the MODEL implies (its embedded ner_id: czech -> cs, english -> en,
    generic -> generic), mirroring ner::new_tokenizer
    (src/ner/bilou_ner.cpp:126-137) — so loading a czech .ner and
    recognizing raw text tokenizes with czech rules without any flag.

    passthrough: extra input columns replicated onto each mention row
    (e.g. ("role", "tool", "ts") for streaming windows / predicate context).
    Works identically on batch and streaming DataFrames (stateless
    mapInPandas).
    """
    from ..model.model import NerModel
    from ..features.templates import Sentence

    _cache = {}
    passthrough = tuple(passthrough)

    def get_model():
        m = _cache.get(model_dir)
        if m is None:
            m = NerModel.load(model_dir)
            _cache[model_dir] = m
        return m

    base_cols = ("conv_id", "turn_idx", "sent_idx", "tok_start", "tok_len",
                 "char_start", "char_len", "type", "surface")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_model()
        rec = _BatchRecognizer(model)
        eff_lang = lang or model.default_tokenizer_lang
        for pdf in batches:
            # tokenize the whole batch first, building Sentence workspaces
            sent_meta = []  # (row_pos, sent_idx, spans, text)
            forms_lists = []
            texts = pdf[text_col]
            for pos in range(len(pdf)):
                text = texts.iloc[pos] or ""
                for s_idx, spans in enumerate(tokenize_sentences(text, eff_lang)):
                    forms_lists.append([text[a : a + b] for (a, b) in spans])
                    sent_meta.append((pos, s_idx, spans, text))
            sentences = model.make_sentence_batch(forms_lists)

            results = rec.recognize_batch(sentences)

            out = {k: [] for k in base_cols}
            row_pos = []
            for (pos, s_idx, spans, text), ents in zip(sent_meta, results):
                for (tok_start, tok_len, type_name) in ents:
                    cs = spans[tok_start][0]
                    last = spans[min(tok_start + tok_len, len(spans)) - 1]
                    ce = last[0] + last[1]
                    row_pos.append(pos)
                    out["conv_id"].append(pdf["conv_id"].iloc[pos])
                    out["turn_idx"].append(pdf["turn_idx"].iloc[pos])
                    out["sent_idx"].append(s_idx)
                    out["tok_start"].append(tok_start)
                    out["tok_len"].append(tok_len)
                    out["char_start"].append(cs)
                    out["char_len"].append(ce - cs)
                    out["type"].append(type_name)
                    out["surface"].append(text[cs:ce])
            res = pd.DataFrame(out)
            for col in passthrough:
                res[col] = pdf[col].iloc[row_pos].reset_index(drop=True) if row_pos else pdf[col].iloc[:0]
            yield res

    cols = ["conv_id", "turn_idx", text_col] + [c for c in passthrough]
    schema = MENTIONS_SCHEMA
    if passthrough:
        extra = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.select(*passthrough).schema.fields)
        schema = MENTIONS_SCHEMA + ", " + extra
    src = df.select(*cols)
    # defensive parallelism: a single-FILE batch input would serialize the
    # NER work onto one task; file-count-based (no DataFrame->RDD probe) and
    # a no-op for in-memory/many-split/streaming inputs
    if not df.isStreaming:
        from ..ops.text import spread_small_input

        src = spread_small_input(src)
    return src.mapInPandas(fn, schema=schema)


def recognize_local(model, texts, lang: str | None = None):
    """Single-process oracle: same kernels, no Spark — used for parity tests
    (FIXTURES.md §6). Returns list of per-text mention dicts. lang=None
    selects the model-implied tokenizer (see recognize_df)."""
    from ..features.templates import Sentence

    lang = lang or model.default_tokenizer_lang
    rec = _BatchRecognizer(model)
    out = []
    for text in texts:
        sents = tokenize_sentences(text, lang)
        sentences = model.make_sentence_batch(
            [[text[a : a + b] for (a, b) in s] for s in sents]
        )
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
