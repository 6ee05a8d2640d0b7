"""Deterministic synthetic multi-turn transcripts with planted gold entities.

Schema per BASELINE.json input_hint:
  (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
   ts:timestamp)

Turns are assembled token-by-token from sentence templates, so gold mention
spans (token-indexed, per sentence) are known by construction and the
tokenizer is expected to round-trip the text exactly (FIXTURES.md §1).
No external data; fully seeded.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

FIRST_NAMES = (
    "Alice Bob Carol David Erin Frank Grace Henry Irene Jack Karen Liam Mona "
    "Nathan Olga Peter Quinn Rosa Steve Tina Ursula Victor Wendy Xavier Yara Zane "
    "Adam Bella Carl Dana Edgar Fiona Gideon Hana Igor Jana Kevin Lena Marek Nora"
).split()
LAST_NAMES = (
    "Johnson Smith Novak Brown Garcia Miller Davis Wilson Moore Taylor Anderson "
    "Thomas Jackson White Harris Martin Thompson Martinez Robinson Clark Lewis "
    "Walker Hall Allen Young King Wright Scott Green Baker Adams Nelson Hill "
    "Campbell Mitchell Roberts Carter Phillips Evans Turner"
).split()
ORG_FIRST = (
    "Acme Globex Initech Umbrella Hooli Vandelay Wayne Stark Wonka Cyberdyne "
    "Tyrell Aperture Sirius Massive Pied Oceanic Virtucon Duff Soylent Monarch"
).split()
ORG_SECOND = "Industries Labs Systems Group Technologies Analytics Dynamics Holdings Networks Software".split()
LOCATIONS = (
    "Prague Berlin London Paris Vienna Madrid Rome Dublin Oslo Helsinki Warsaw "
    "Lisbon Athens Amsterdam Brussels Copenhagen Stockholm Budapest Zagreb Bratislava"
).split()
TOOLS = ["search", "calendar", "crm", "mailer", "wiki", ""]
FILLER = (
    "the a quick status update please review this item and confirm details "
    "we should discuss next steps before deadline also note that results look "
    "good overall but need minor changes soon thanks again for checking"
).split()

DOMAINS = ["acme.com", "globex.org", "initech.net", "example.com", "hooli.io"]


def _sentence_templates(rng: random.Random, pools=None):
    """Yield (tokens, mentions) where mentions are (tok_start, tok_len, type).
    pools: optional (first, last, org_first, locations) override — used by
    the distributed generator, which cannot swap module globals."""
    if pools is None:
        firsts, lasts, orgf, locs = FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS
    else:
        firsts, lasts, orgf, locs = pools
    first = rng.choice(firsts)
    last = rng.choice(lasts)
    first2 = rng.choice(firsts)
    last2 = rng.choice(lasts)
    org = [rng.choice(orgf), rng.choice(ORG_SECOND)]
    loc = rng.choice(locs)
    year = str(rng.randint(1990, 2030))
    day = str(rng.randint(1, 28))
    domain = rng.choice(DOMAINS)
    email = f"{first.lower()}.{last.lower()}@{domain}"
    url = f"https://{domain}/{rng.choice(['docs', 'wiki', 'x', 'report'])}"

    kind = rng.randint(0, 7)
    if kind == 0:
        toks = [first, last, "works", "at", org[0], org[1], "in", loc, "."]
        mentions = [(0, 2, "PER"), (4, 2, "ORG"), (7, 1, "LOC")]
    elif kind == 1:
        toks = [first, "emailed", email, "about", "the", "meeting", "."]
        mentions = [(0, 1, "PER"), (2, 1, "EMAIL")]
    elif kind == 2:
        toks = ["see", url, "for", "details", "from", org[0], org[1], "."]
        mentions = [(1, 1, "URL"), (5, 2, "ORG")]
    elif kind == 3:
        toks = [first, last, "met", first2, last2, "in", loc, "on", day, "May", year, "."]
        mentions = [(0, 2, "PER"), (3, 2, "PER"), (6, 1, "LOC"), (8, 3, "TIME")]
    elif kind == 4:
        toks = [org[0], org[1], "opened", "an", "office", "in", loc, "in", year, "."]
        mentions = [(0, 2, "ORG"), (6, 1, "LOC"), (8, 1, "TIME")]
    elif kind == 5:
        n = rng.randint(4, 9)
        toks = [rng.choice(FILLER) for _ in range(n)] + ["."]
        mentions = []
    elif kind == 6:
        toks = [first2, "visited", loc, "last", "week", "."]
        mentions = [(0, 1, "PER"), (2, 1, "LOC")]
    else:
        toks = ["contact", first, last, "at", email, "or", url, "."]
        mentions = [(1, 2, "PER"), (4, 1, "EMAIL"), (6, 1, "URL")]
    # Capitalize the sentence-initial token so the eos rule (which requires
    # an upper-case char after the terminator) segments turns exactly as
    # planted; gold surfaces are recorded after this.
    toks[0] = toks[0][:1].upper() + toks[0][1:]
    return toks, mentions


_NAME_SYLLABLES = (
    "ba re mo li ka ve zo ti na den dur fel gim hos jat kren lum pol sor "
    "vik wen yor bran crest dolm"
).split()


def _scaled_pool(pool, scale: int):
    """Expand a name pool with deterministic pseudo-names built from
    syllables — single capitalized word tokens that are mutually DISSIMILAR
    (distinct shingle sets), so a scaled vocabulary grows the resolve
    phase's entity population instead of a near-duplicate cloud. (A first
    cut used letter-suffixed variants — "Alicea", "Aliceb" — but those are
    ~0.8 Jaccard to each other, which legitimately collapses them into few
    entities and floods the LSH bucket cap; that shape is a useful
    stress test, not a wide vocabulary.)"""
    if scale <= 1:
        return pool
    out = list(pool)
    seen = {w.lower() for w in pool}
    for i in range(1, scale):
        for w in pool:
            r = random.Random(f"namegen:{w}:{i}")
            name = "".join(
                r.choice(_NAME_SYLLABLES) for _ in range(r.randint(2, 4))
            ).capitalize()
            while name.lower() in seen:
                name += r.choice("bcdfglmnprst")
            seen.add(name.lower())
            out.append(name)
    return out


def synth_transcripts(
    n_conversations: int = 50,
    seed: int = 42,
    avg_turns: int = 6,
    mega_conversation: bool = False,
    vocab_split: str | None = None,
    vocab_scale: int = 1,
):
    """-> (transcripts_df, gold_df) as pandas DataFrames.

    gold columns: conv_id, turn_idx, sent_idx, tok_start, tok_len, type,
    surface (mention token spans are sentence-local).

    vocab_scale multiplies the entity-name pools with syllable-built
    pseudo-names (mutually DISSIMILAR — see _scaled_pool; letter-suffixed
    variants were rejected because they form a near-duplicate cloud) so the
    DISTINCT-surface population grows with the corpus — the axis the
    resolve phase (LSH + connected components) actually scales on.
    """
    rng = random.Random(seed)
    base_ts = dt.datetime(2025, 1, 1, 0, 0, 0)

    # generalization protocol: disjoint entity vocab halves so eval entities
    # are unseen in training (features must generalize, not memorize)
    global FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS
    saved = (FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS)
    if vocab_split == "train":
        FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS = (
            v[: len(v) // 2] for v in saved
        )
    elif vocab_split == "eval":
        FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS = (
            v[len(v) // 2 :] for v in saved
        )
    if vocab_scale > 1:
        FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS = (
            _scaled_pool(v, vocab_scale)
            for v in (FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS)
        )

    rows = []
    gold = []
    for c in range(n_conversations):
        conv_id = f"conv-{c:06d}"
        n_turns = rng.randint(max(2, avg_turns - 3), avg_turns + 3)
        if mega_conversation and c == 0:
            n_turns = avg_turns * 100  # skew fixture: one mega-conversation
        for t in range(n_turns):
            role = ("user", "assistant", "tool")[t % 3]
            tool = rng.choice(TOOLS[:-1]) if role == "tool" else ""
            n_sents = rng.randint(1, 3)
            words = []
            for s in range(n_sents):
                toks, mentions = _sentence_templates(rng)
                for (ms, ml, mt) in mentions:
                    gold.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": t,
                            "sent_idx": s,
                            "tok_start": ms,
                            "tok_len": ml,
                            "type": mt,
                            "surface": " ".join(toks[ms : ms + ml]),
                        }
                    )
                words.extend(toks)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": " ".join(words),
                    "tool": tool,
                    "ts": base_ts + dt.timedelta(hours=c, seconds=37 * t),
                }
            )

    tdf = pd.DataFrame(rows)
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    gdf = pd.DataFrame(
        gold,
        columns=["conv_id", "turn_idx", "sent_idx", "tok_start", "tok_len", "type", "surface"],
    )
    FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS = saved
    return tdf, gdf


def synth_transcripts_dist(
    spark,
    n_conversations: int,
    seed: int = 42,
    avg_turns: int = 6,
    vocab_scale: int = 1,
):
    """Distributed synthetic corpus (no gold): `spark.range` over
    conversation ids -> per-conversation generation inside mapInPandas, so
    the driver never holds the corpus (flat RSS at any scale — the
    driver-side `synth_transcripts` peaked >3 GB at 1M turns).

    Each conversation is seeded by (seed, conv_id), so the output is
    deterministic and independent of partitioning — the 100-TB-shaped way
    to produce the 10^12-turn transcript table the north rule targets.
    Statistically identical to `synth_transcripts` (same templates/vocab),
    not byte-identical (different rng stream layout).
    """

    pools = (
        tuple(
            _scaled_pool(v, vocab_scale)
            for v in (FIRST_NAMES, LAST_NAMES, ORG_FIRST, LOCATIONS)
        )
        if vocab_scale > 1
        else None
    )

    def gen(batches):
        base_ts = dt.datetime(2025, 1, 1, 0, 0, 0)
        for pdf in batches:
            rows = []
            for c in pdf["id"]:
                c = int(c)
                rng = random.Random(f"{seed}:{c}")
                conv_id = f"conv-{c:08d}"
                n_turns = rng.randint(max(2, avg_turns - 3), avg_turns + 3)
                for t in range(n_turns):
                    role = ("user", "assistant", "tool")[t % 3]
                    tool = rng.choice(TOOLS[:-1]) if role == "tool" else ""
                    words = []
                    for _s in range(rng.randint(1, 3)):
                        toks, _m = _sentence_templates(rng, pools)
                        words.extend(toks)
                    rows.append(
                        (
                            conv_id,
                            t,
                            role,
                            " ".join(words),
                            tool,
                            base_ts + dt.timedelta(hours=c % 80_000, seconds=37 * t),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    par = spark.sparkContext.defaultParallelism
    n_parts = max(par, min(4096, n_conversations // 2000 + 1))
    return (
        spark.range(0, n_conversations, numPartitions=n_parts)
        .mapInPandas(gen, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    )


def gold_to_conll(transcripts: pd.DataFrame, gold: pd.DataFrame) -> str:
    """Render gold as CoNLL 2-column training data (form<TAB>label).

    Sentences are re-derived with the tokenizer to guarantee the labels are
    aligned with what the pipeline will see.
    """
    from ..tokenizer.rules import tokenize_forms

    key = {}
    for r in gold.itertuples(index=False):
        key.setdefault((r.conv_id, r.turn_idx, r.sent_idx), []).append(r)

    lines = []
    for row in transcripts.itertuples(index=False):
        sents = tokenize_forms(row.text)
        for s_idx, forms in enumerate(sents):
            labels = ["O"] * len(forms)
            for m in key.get((row.conv_id, row.turn_idx, s_idx), ()):
                for k in range(m.tok_len):
                    if m.tok_start + k < len(labels):
                        labels[m.tok_start + k] = ("B-" if k == 0 else "I-") + m.type
            for f, l in zip(forms, labels):
                lines.append(f"{f}\t{l}")
            lines.append("")
    return "\n".join(lines)
