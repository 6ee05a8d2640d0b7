"""Output sinks replicating the reference CLI formats (SURVEY.md §2.1
S5-S7): CoNLL, vertical, and XML renderings of recognized entities.

The kernels are pure-Python per (text, sorted entities) — exactly the
stream formats of /root/reference/src/run_ner.cpp:63-172 — wrapped as
mapInPandas DataFrame transforms so each turn renders in parallel and the
result stays a string column (one row per turn).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..ner import core
from ..tokenizer.rules import tokenize_sentences


def _xml_encode(s: str, in_attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if in_attr:
        s = s.replace('"', "&quot;")
    return s


def render_conll_fragments(pairs) -> Iterator[str]:
    """Per-sentence CoNLL fragments from a LAZY iterable of
    (forms, entities) — fragments stream while later sentences are still
    being decoded (the reference service streams one JSON fragment per
    sentence, nametag_service.cpp:146-200)."""
    for forms, entities in pairs:
        out = []
        entities = core.sort_entities(entities)
        stack = []
        e = 0
        for i, form in enumerate(forms):
            while e < len(entities) and entities[e][0] == i:
                stack.append(entities[e])
                e += 1
            if stack:
                label = "|".join(
                    ("B-" if ent[0] == i else "I-") + ent[2] for ent in stack
                )
            else:
                label = "O"
            out.append(f"{form}\t{label}")
            stack = [ent for ent in stack if ent[0] + ent[1] != i + 1]
        out.append("")
        yield "\n".join(out) + "\n"


def render_conll(sent_forms, sent_entities) -> str:
    """CoNLL sink (run_ner.cpp:63-97): form<TAB>B-T|I-T... stacked for
    nested entities, 'O' otherwise; blank line after each sentence."""
    return "".join(render_conll_fragments(zip(sent_forms, sent_entities)))


def render_vertical_fragments(pairs) -> Iterator[str]:
    """Per-sentence vertical fragments (lazy pairs of (forms, entities));
    token ids stay global across sentences with a +1 gap per sentence."""
    total_tokens = 0
    for forms, entities in pairs:
        out = []
        entities = core.sort_entities(entities)
        for (start, length, etype) in entities:
            ids = ",".join(str(total_tokens + i + 1) for i in range(start, start + length))
            text = " ".join(forms[start : start + length])
            out.append(f"{ids}\t{etype}\t{text}")
        total_tokens += len(forms) + 1
        yield "\n".join(out) + ("\n" if out else "")


def render_vertical(sent_forms, sent_entities) -> str:
    """Vertical sink (run_ner.cpp:99-130): `ids<TAB>type<TAB>text`, token
    ids global across sentences with a +1 gap per sentence."""
    return "".join(render_vertical_fragments(zip(sent_forms, sent_entities)))


def render_xml_fragments(text: str, pairs) -> Iterator[str]:
    """Per-sentence XML fragments (lazy pairs of (spans, entities));
    inter-sentence whitespace is attached to the FOLLOWING sentence and the
    document tail is a final fragment."""
    unprinted = 0
    for spans, entities in pairs:
        out = []
        entities = core.sort_entities(entities)
        entity_ends = []
        e = 0
        for i, (s, l) in enumerate(spans):
            if unprinted < s:
                out.append(_xml_encode(text[unprinted:s]))
            if i == 0:
                out.append("<sentence>")
            while e < len(entities) and entities[e][0] == i:
                out.append(f'<ne type="{_xml_encode(entities[e][2], True)}">')
                entity_ends.append(entities[e][0] + entities[e][1] - 1)
                e += 1
            out.append("<token>" + _xml_encode(text[s : s + l]) + "</token>")
            while entity_ends and entity_ends[-1] == i:
                out.append("</ne>")
                entity_ends.pop()
            if i + 1 == len(spans):
                out.append("</sentence>")
            unprinted = s + l
        yield "".join(out)
    if unprinted < len(text):
        yield _xml_encode(text[unprinted:])


def render_xml(text: str, sent_spans, sent_entities) -> str:
    """XML sink (run_ner.cpp:132-172): <sentence>/<ne type>/<token> markup
    preserving inter-token whitespace."""
    return "".join(render_xml_fragments(text, zip(sent_spans, sent_entities)))


def render_df(df: DataFrame, model_dir: str, fmt: str = "conll", text_col: str = "text",
              lang: str | None = None) -> DataFrame:
    """Render each turn in the given format -> (conv_id, turn_idx, rendered).

    fmt: 'conll' | 'vertical' | 'xml'. lang=None selects the model-implied
    tokenizer (ner::new_tokenizer, src/ner/bilou_ner.cpp:126-137); sentences
    are built through model.make_sentence so morphology-bearing models
    (embedded MorphoDiTa taggers) render with full morphology.
    """
    if fmt not in ("conll", "vertical", "xml"):
        raise ValueError(f"unknown sink format {fmt!r}")

    from ..model.model import NerModel
    from ..ner.pipeline import _BatchRecognizer

    _cache: dict = {}

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _cache.get(model_dir)
        if model is None:
            model = NerModel.load(model_dir)
            _cache[model_dir] = model
        rec = _BatchRecognizer(model)
        eff_lang = lang or model.default_tokenizer_lang
        for pdf in batches:
            rendered = []
            for text in pdf[text_col]:
                text = text or ""
                sent_spans = tokenize_sentences(text, eff_lang)
                forms = [[text[a : a + b] for (a, b) in s] for s in sent_spans]
                ents = rec.recognize_batch(model.make_sentence_batch(forms))
                if fmt == "conll":
                    rendered.append(render_conll(forms, ents))
                elif fmt == "vertical":
                    rendered.append(render_vertical(forms, ents))
                else:
                    rendered.append(render_xml(text, sent_spans, ents))
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "rendered": rendered,
                }
            )

    return df.select("conv_id", "turn_idx", text_col).mapInPandas(
        fn, schema="conv_id string, turn_idx int, rendered string"
    )
