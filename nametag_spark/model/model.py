"""Model container: entity map + feature templates + stage networks.

Replaces the reference's compressed binary model stream
(/root/reference/src/ner/bilou_ner.cpp:21-35, save order
/root/reference/src/ner/bilou_ner_trainer.cpp:69-74) with a directory of
JSON (entity map, template state) + npz (network weights), loaded on the
driver and broadcast to executors (SURVEY.md §1.1 "Model").
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..features.templates import EntityMap, FeatureTemplates, Sentence
from ..ner import core


class NerModel:
    def __init__(self, entities: EntityMap, templates: FeatureTemplates, networks, tagger=None,
                 ner_lang=None):
        self.entities = entities
        self.templates = templates
        self.networks = networks  # list[core.Network], one per stage
        # optional MorphoTagger (G4-G6): when present, sentences are built
        # with real (lemma, tag) morphology instead of the trivial tagger
        self.tagger = tagger
        # the reference ner_id ("czech"/"english"/"generic",
        # src/ner/ner_ids.h:19) — drives default tokenizer selection like
        # ner::new_tokenizer (src/ner/bilou_ner.cpp:126-137)
        self.ner_lang = ner_lang

    @property
    def stages(self) -> int:
        return len(self.networks)

    @property
    def default_tokenizer_lang(self) -> str:
        """The tokenizer grammar the loaded model implies, mirroring
        bilou_ner::new_tokenizer (src/ner/bilou_ner.cpp:126-137): CZECH_NER
        -> czech tokenizer, ENGLISH_NER -> english, GENERIC_NER -> generic.
        Directory models trained here default to english (the historic
        default) unless saved with an explicit ner_lang."""
        return {"czech": "cs", "english": "en", "generic": "generic"}.get(
            self.ner_lang or "", "en"
        )

    # ------------------------------------------------------------------ io
    def save(self, model_dir: str) -> None:
        os.makedirs(model_dir, exist_ok=True)
        meta = {
            "format": "nametag_spark/1",
            "entities": self.entities.id2str,
            "templates": self.templates.state(),
            "stages": self.stages,
        }
        if self.ner_lang:
            meta["ner_lang"] = self.ner_lang
        with open(os.path.join(model_dir, "model.json"), "w", encoding="utf-8") as f:
            json.dump(meta, f)
        arrays = {}
        for s, net in enumerate(self.networks):
            for k, v in net.to_arrays().items():
                arrays[f"net{s}_{k}"] = v
        np.savez_compressed(os.path.join(model_dir, "networks.npz"), **arrays)
        if self.tagger is not None:
            with open(os.path.join(model_dir, "morpho.json"), "w", encoding="utf-8") as f:
                json.dump(self.tagger.state(), f)

    @classmethod
    def load(cls, model_dir: str) -> "NerModel":
        # a plain file is a reference binary .ner model (ner.cpp:31-48
        # dispatch); a directory is the native JSON+npz layout — so every
        # entry point (recognize_df, sinks, REST, bench) accepts both
        if os.path.isfile(model_dir):
            from .binary_reader import load_binary_ner

            return load_binary_ner(model_dir)
        with open(os.path.join(model_dir, "model.json"), encoding="utf-8") as f:
            meta = json.load(f)
        entities = EntityMap(meta["entities"])
        templates = FeatureTemplates.from_state(meta["templates"], base_dir=model_dir)
        arrs = np.load(os.path.join(model_dir, "networks.npz"))
        networks = [core.Network.from_arrays(arrs, prefix=f"net{s}_") for s in range(meta["stages"])]
        tagger = None
        morpho_path = os.path.join(model_dir, "morpho.json")
        if os.path.exists(morpho_path):
            with open(morpho_path, encoding="utf-8") as f:
                st = json.load(f)
            if st.get("kind") == "morphodita":
                from ..morpho.morphodita import MorphoditaTagger

                tagger = MorphoditaTagger.from_state(st)
            else:
                from ..morpho.tagger import MorphoTagger

                tagger = MorphoTagger.from_state(st)
        return cls(entities, templates, networks, tagger, ner_lang=meta.get("ner_lang"))

    # --------------------------------------------------- sentence construction
    def make_sentence(self, forms) -> Sentence:
        """Trivial tagger (raw_lemma=lemma=form, tag='') without morphology;
        with a MorphoTagger, PDT-split lemmas + tags (morphodita_tagger.cpp
        contract) so F5-F8 templates see real values."""
        if self.tagger is not None:
            if hasattr(self.tagger, "ner_tag_columns"):
                # MorphoDiTa tagger: full per-token morphology incl. the
                # sorted-unique raw lemmas of ALL analyses
                # (morphodita_tagger.cpp:40-80), column-oriented
                fs, comments, raws, lids, tags, _none, keys, shared = self.tagger.ner_tag_columns(forms)
                sent = Sentence(
                    fs,
                    lemma_comments=comments,
                    raw_lemmas=raws,
                    lemma_ids=lids,
                    tags=tags,
                )
                sent._raw_all_src = self.tagger  # lazy raw_lemmas_all
                sent._fast_token_keys = keys
                # content-determined memo stores shared across Sentence
                # instances of the same cached text (gazetteer walks, pins)
                sent._gaz_sources = shared["gaz"]
                sent._shared_memo = shared
                return sent
            if hasattr(self.tagger, "ner_tag_sentence"):
                info = self.tagger.ner_tag_sentence(forms)
                return Sentence(
                    [w["form"] for w in info],
                    lemma_comments=[w["lemma_comments"] for w in info],
                    raw_lemmas=[w["raw_lemma"] for w in info],
                    lemma_ids=[w["lemma_id"] for w in info],
                    tags=[w["tag"] for w in info],
                    raw_lemmas_all=[w["raw_lemmas_all"] for w in info],
                )
            lemmas, tags = self.tagger.tag_sentence(forms)
            return Sentence.from_pdt(forms, lemmas, tags)
        return Sentence(list(forms))

    def make_sentence_batch(self, forms_lists) -> list:
        """Batched make_sentence: with a MorphoDiTa tagger the per-form /
        per-token cache passes flatten across the whole batch
        (ner_tag_columns_batch); other taggers fall back per-sentence.
        Element-identical to [self.make_sentence(f) for f in forms_lists]."""
        tagger = self.tagger
        if tagger is None or not hasattr(tagger, "ner_tag_columns_batch"):
            return [self.make_sentence(f) for f in forms_lists]
        sents = []
        for v in tagger.ner_tag_columns_batch(forms_lists):
            fs, comments, raws, lids, tags, _none, keys, shared = v
            sent = Sentence(
                fs,
                lemma_comments=comments,
                raw_lemmas=raws,
                lemma_ids=lids,
                tags=tags,
            )
            sent._raw_all_src = tagger
            sent._fast_token_keys = keys
            sent._gaz_sources = shared["gaz"]
            sent._shared_memo = shared
            sents.append(sent)
        return sents

    # ------------------------------------------------------- single sentence
    def recognize_sentence(self, forms):
        """Run the full multi-stage pipeline on one tokenized sentence.

        Reference loop: /root/reference/src/ner/bilou_ner.cpp:37-94.
        Returns sorted (start, length, type_name) spans.
        """
        sent = self.make_sentence(forms)
        if sent.size == 0:
            return []
        sent.clear_previous_stage()
        for net in self.networks:
            sent.clear_probabilities_local_filled()
            self.templates.process_sentence(sent)  # may pin local_filled rows

            unfilled = [i for i in range(sent.size) if not sent.local_filled[i]]
            if unfilled:
                flat = []
                ptr = [0]
                for i in unfilled:
                    flat.extend(sent.features[i])
                    ptr.append(len(flat))
                probs = net.scores_batch(np.asarray(flat, dtype=np.int64), np.asarray(ptr, dtype=np.int64))
                local, ent = core.fill_bilou_probabilities(probs)
                for r, i in enumerate(unfilled):
                    sent.local[i] = local[r]
                    sent.local_ent[i] = ent[r]
                    sent.local_filled[i] = True

            best, best_ent = core.viterbi_decode(sent.local, sent.local_ent)
            sent.prev_bilou = [int(b) for b in best]
            sent.prev_ent = [int(e) for e in best_ent]

        spans = core.extract_entities(best, best_ent)
        entities = [[s, l, self.entities.name(e)] for (s, l, e) in spans]
        self.templates.process_entities(sent, entities, self.entities)
        return core.sort_entities([tuple(e) for e in entities])
