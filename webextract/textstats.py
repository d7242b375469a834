"""Text-analysis library for training-data pipelines: token counting,
language ID, quality scoring, document fingerprinting.

Reusable DataFrame-in/DataFrame-out APIs (VERDICT r1 next-round #5) whose
semantics are pinned by the driver's DuckDB oracles in __spark_entry__
(token_counts_by_lang / token_counts_regex / lang_id_stopwords /
lang_id_char_ngrams / doc_quality_scores / doc_fingerprints /
winnow_fingerprints / compound_word_segment). Everything is native
Catalyst — no Python UDFs — so at 100 TB these are one scan + (at
most) one hash aggregation each. (One deliberate exception:
``normalize_nfc`` — Unicode canonical composition is not
Catalyst-expressible, so it is an Arrow-batched pandas UDF; still
in-row, zero shuffle.)

Round 4 adds ``join_compounds``/``segment_vi`` — deterministic
dictionary word segmentation (F13, the reference's underthesea
word_tokenize shape, ai_service_local.py:81-94, without the
nondeterministic model dependency) — and the Gopher quality-filter
family: ``repetition_signals`` (dup-line fractions in-row; top/dup
n-gram char fractions as two hash aggregations — oracle
`gopher_repetition_signals`) and ``gopher_quality_flags`` (the Rae
et al. 2021 Table-A1 rule battery, in-row, zero shuffle — oracle
`gopher_quality_flags`). Ratio columns are RAW single divisions of
exact integer counts — bit-identical across Spark/DuckDB, no
engine-side rounding (HALF_UP-vs-half-even diverges on power-of-two
denominators; the driver canonicalizer rounds at 6 on both sides).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

EN_STOPWORDS = ["the", "of", "and", "a", "to", "in", "is", "on", "for", "with"]
VI_STOPWORDS = ["và", "của", "các", "là", "có", "cho", "trong", "được",
                "người", "không"]

SUBTOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"  # BPE-ish: letter runs /
                                                # digit runs / single punct


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens (whitespace) and n_subtokens (regex tokenizer) —
    the two token-budget estimators for corpus sizing."""
    return df.withColumn(
        "n_tokens", F.size(_tokens(text_col)).cast("bigint")
    ).withColumn(
        "n_subtokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(SUBTOKEN_RE), F.lit(0)))
        .cast("bigint"),
    )


def lang_id_stopwords(df: DataFrame, text_col: str = "text",
                      langs: dict[str, list[str]] | None = None) -> DataFrame:
    """Word-level language ID: count stopword hits per language over
    whitespace tokens; argmax with 'und' ties. Adds {lang}_hits columns +
    pred_lang."""
    langs = langs or {"en": EN_STOPWORDS, "vi": VI_STOPWORDS}
    out = df
    for lang, words in langs.items():
        wset = F.array(*[F.lit(w) for w in words])
        out = out.withColumn(
            f"{lang}_hits",
            F.size(F.filter(_tokens(text_col),
                            lambda x: F.array_contains(wset, x))).cast("bigint"),
        )
    names = list(langs)
    pred = F.lit("und")
    for lang in names:
        others = [F.col(f"{o}_hits") for o in names if o != lang]
        cond = F.col(f"{lang}_hits") > F.greatest(*others) if len(others) > 1 \
            else F.col(f"{lang}_hits") > others[0]
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def lang_id_char_ngrams(df: DataFrame, text_col: str = "text",
                        ngrams: dict[str, list[str]] | None = None) -> DataFrame:
    """Char-bigram language ID (occurrence counting via length/replace —
    zero regex, pure codegen). Adds {lang}_bigrams + pred_lang."""
    ngrams = ngrams or {"en": ["th", "he", "in", "er", "an"],
                        "vi": ["ng", "nh", "ch", "uy", "ph"]}

    def count_of(g: str) -> Column:
        return ((F.length(text_col) -
                 F.length(F.replace(F.col(text_col), F.lit(g), F.lit(""))))
                / len(g)).cast("bigint")

    out = df
    for lang, grams in ngrams.items():
        total = None
        for g in grams:
            total = count_of(g) if total is None else total + count_of(g)
        out = out.withColumn(f"{lang}_bigrams", total)
    names = list(ngrams)
    pred = F.lit("und")
    for lang in names:
        others = [F.col(f"{o}_bigrams") for o in names if o != lang]
        cond = F.col(f"{lang}_bigrams") > F.greatest(*others) if len(others) > 1 \
            else F.col(f"{lang}_bigrams") > others[0]
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


# Common Vietnamese multi-syllable compound words (public vocabulary;
# ordering inside a syllable-count tier is the list order below — part
# of the deterministic spec). Nested entries ("xã hội chủ nghĩa" ⊃
# "xã hội", "cộng hòa xã hội chủ nghĩa" ⊃ both) pin longest-first wins.
VI_COMPOUNDS = [
    "cộng hòa xã hội chủ nghĩa", "xã hội chủ nghĩa", "tổng giám đốc",
    "văn bản", "hồ sơ", "tài liệu", "quyết định", "nghị định",
    "thông tư", "cơ quan", "chính phủ", "ủy ban", "nhân dân", "xã hội",
    "học sinh", "sinh viên", "đại học", "giáo dục", "kinh tế",
    "thông tin", "số lượng", "ngày tháng", "địa chỉ", "điện thoại",
    "công ty", "doanh nghiệp", "thủ tướng", "bộ trưởng", "chủ tịch",
    "giám đốc", "nhà nước", "pháp luật", "quy định", "nội dung",
    "thời gian", "kế hoạch", "báo cáo", "dự án", "hợp đồng",
    "ngân hàng", "tài chính", "ngân sách", "cộng hòa", "độc lập",
    "tự do", "hạnh phúc", "việt nam", "hà nội",
]


def _ordered_compounds(compounds: list[str]) -> list[str]:
    # longest (syllable count) first; Python's stable sort keeps the
    # caller's list order within a tier — both are part of the spec
    return sorted(compounds, key=lambda c: -len(c.split()))


def join_compounds(df: DataFrame, text_col: str = "text",
                   compounds: list[str] | None = None) -> DataFrame:
    """F13 — deterministic dictionary word segmentation (the reference's
    underthesea word_tokenize, ai_service_local.py:81-94, re-expressed
    without the nondeterministic model dependency): known multi-word
    compounds are joined into single tokens with '_', longest-first,
    via WHOLE-WORD substring replacement. Mechanism: double every
    space so each token boundary owns a space on both sides, then for
    compound "a b" replace " a  b " → " a_b " — plain substring
    replace, so the chain replays VERBATIM in any SQL dialect
    (``replace`` in DuckDB — no regex, no lookaround, no recursion),
    and a boundary's leftover space keeps adjacent matches intact.
    Pure Catalyst codegen string ops; O(|dict|) passes over the text,
    one scan, zero shuffle — at 100 TB this pipelines with any
    downstream aggregation.

    Determinism spec: compounds apply longest-syllable-count-first,
    then input-list order (stable sort); replacement is the engine's
    standard non-overlapping left-to-right scan (identical in Spark
    and DuckDB). Matching is CASE-SENSITIVE (the lexicon is lowercase;
    sentence-initial capitalized occurrences stay unjoined — lowercase
    upstream if that matters). Multi-space runs in the input never
    match (a compound pattern requires exactly one original space
    between syllables) — documented, dialect-identical behavior.

    Adds: ``seg_text`` (tokens re-joined with single spaces, compounds
    '_'-joined), ``n_words`` (post-join token count), ``n_compounds``
    (tokens containing '_')."""
    comps = _ordered_compounds(
        VI_COMPOUNDS if compounds is None else compounds)
    c = F.concat(F.lit(" "),
                 F.replace(F.coalesce(F.col(text_col), F.lit("")),
                           F.lit(" "), F.lit("  ")),
                 F.lit(" "))
    for comp in comps:
        pattern = " " + "  ".join(comp.split()) + " "
        joined = " " + "_".join(comp.split()) + " "
        c = F.replace(c, F.lit(pattern), F.lit(joined))
    toks = F.filter(F.split(c, " "), lambda x: x != "")
    return (
        df.withColumn("seg_text", F.array_join(toks, " "))
        .withColumn("n_words", F.size(toks).cast("bigint"))
        .withColumn(
            "n_compounds",
            F.size(F.filter(toks, lambda x: x.contains("_"))).cast("bigint"))
    )


def segment_vi(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Vietnamese instantiation of ``join_compounds`` (the F13 operator
    proper): the embedded VI_COMPOUNDS lexicon over Vietnamese text."""
    return join_compounds(df, text_col, VI_COMPOUNDS)


def quality_scores(df: DataFrame, text_col: str = "text",
                   len_target: int = 500, nd: int = 4) -> DataFrame:
    """Length / repetition / punctuation heuristics → quality_score in
    [0, 1]: 0.4·length-saturation + 0.3·type-token ratio + 0.3·(1 −
    punctuation-density). Deterministic, no model."""
    toks = _tokens(text_col)
    n_chars = F.length(text_col).cast("double")
    punct = None
    for ch in ".,!?":
        c = F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit(ch), F.lit("")))
        punct = c if punct is None else punct + c
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    rep = 1.0 - ttr  # repetition = 1 − type-token ratio
    # NB: 0.3·(1 − rep) not 0.3·ttr — algebraically equal, but float-exact
    # parity with the DuckDB oracle requires the same operation sequence
    score = (
        0.4 * F.least(F.lit(1.0), n_chars / len_target)
        + 0.3 * (1.0 - rep)
        + 0.3 * (1.0 - F.least(F.lit(1.0), 10.0 * punct.cast("double") / n_chars))
    )
    return (
        df.withColumn("n_tokens", F.size(toks).cast("bigint"))
        .withColumn("n_distinct_tokens",
                    F.size(F.array_distinct(toks)).cast("bigint"))
        .withColumn("chars_per_token", F.round(n_chars / F.size(toks), nd))
        .withColumn("repetition_ratio", F.round(rep, nd))
        .withColumn("punct_ratio", F.round(punct.cast("double") / n_chars, nd))
        .withColumn("quality_score", F.round(score, 6))
    )


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", line_sep: str = "\n",
                       n_top: int = 2, n_dup: int = 5) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) per doc:

    - ``n_lines``, ``dup_line_frac`` (repeated line occurrences beyond
      the first / total lines), ``dup_line_char_frac`` (characters in
      those repeated occurrences / total line characters) — in-row
      array ops, zero shuffle;
    - ``top_gram`` / ``top_gram_frac``: the most frequent word
      ``n_top``-gram and the fraction of n-gram characters it covers
      (count × chars / total n-gram chars). Ties break to the
      lexicographically largest gram (deterministic spec);
    - ``dup_gram_frac``: fraction of ``n_dup``-gram characters covered
      by grams occurring more than once.

    Words = non-empty splits of the text with ``line_sep`` replaced by
    a space (Gopher tokenizes across lines). The n-gram metrics are two
    hash aggregations over exploded grams — partial-agg friendly, no
    windows, so at 100 TB each is one shuffle of (doc, gram-hash)-sized
    rows. Divergence from the paper (documented): char fractions are
    over occurrence-weighted n-gram characters, not unique text
    positions (overlap-exact coverage needs per-position bookkeeping
    that buys nothing for filtering); both are monotone in repetition.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL text ≡ empty doc
    lines = F.filter(F.split(t, _lit_re(line_sep)), lambda x: x != "")
    dlines = F.array_distinct(lines)

    def _chars(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0).cast("bigint"),
                           lambda a, x: a + F.length(x))

    n_lines = F.size(lines).cast("bigint")
    lchars = _chars(lines)
    base = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.replace(t, F.lit(line_sep), F.lit(" ")), " "),
            lambda x: x != "").alias("_toks"),
        # raw line-metric INTEGERS, string-encoded — they ride the
        # per-doc sentinel row's gram slot through the aggregation
        # chain (exact: no double formatting round-trip; the fractions
        # are derived after the final aggregate)
        F.concat_ws(
            "\x1f",
            n_lines.cast("string"),
            F.size(dlines).cast("string"),
            lchars.cast("string"),
            _chars(dlines).cast("string"),
        ).alias("_lmetrics"),
    )

    def _grams(n: int) -> Column:
        from .dedup import token_windows  # shared n-gram window builder
        return token_windows(F.col("_toks"), n)

    # Both n-gram metrics share ONE exploded pass (tagged union) and one
    # aggregation chain, and a per-doc SENTINEL row (tag 's', gram =
    # the string-encoded line metrics) rides the same union — so the
    # input subtree is referenced exactly ONCE, there is no final
    # metrics join, and composing this op over an expensive upstream
    # (host quota, dedup) never re-executes that subtree (the same
    # single-reference discipline as dedup.dedup_paragraphs; the
    # sentinel costs one extra row per doc against ~hundreds of gram
    # rows and adds no bytes to the gram rows themselves).
    # Shuffle-byte economy (VERDICT r4 #2): only the TOP-gram arm's
    # output needs the gram text, so only that arm ships strings; the
    # dup arm needs nothing but count × length per distinct gram, so it
    # ships a 12-byte (xxhash64, length) fingerprint instead — roughly
    # halving the post-partial-agg exchange bytes at corpus scale.
    # (Distinct grams colliding in xxhash64 AND length would merge —
    # ~n²/2⁶⁵ per doc, negligible against the filter's purpose.)
    def _tag_top(arr: Column) -> Column:
        return F.transform(arr, lambda g: F.struct(
            F.lit("t").alias("tag"), g.alias("gram"),
            F.lit(0).cast("bigint").alias("ghash"),
            F.length(g).alias("glen")))

    def _tag_dup(arr: Column) -> Column:
        return F.transform(arr, lambda g: F.struct(
            F.lit("d").alias("tag"), F.lit("").alias("gram"),
            F.xxhash64(g).alias("ghash"),
            F.length(g).alias("glen")))

    def _sentinel() -> Column:
        return F.array(F.struct(
            F.lit("s").alias("tag"), F.col("_lmetrics").alias("gram"),
            F.lit(0).cast("bigint").alias("ghash"),
            F.lit(0).alias("glen")))

    tg = base.select(
        id_col,
        F.explode(F.concat(_sentinel(),
                           _tag_top(_grams(n_top)),
                           _tag_dup(_grams(n_dup)))).alias("_tg"),
    ).select(id_col, F.col("_tg.tag").alias("tag"),
             F.col("_tg.gram").alias("gram"),
             F.col("_tg.ghash").alias("ghash"),
             F.col("_tg.glen").alias("glen"))
    counts = tg.groupBy(id_col, "tag", "gram", "ghash", "glen").agg(
        F.count("*").alias("cnt"))
    gchars = F.col("cnt") * F.col("glen")
    agg = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("tag") == "s", F.col("gram"))).alias("_lm"),
        F.max(F.when(F.col("tag") == "t", F.struct("cnt", "gram")))
        .alias("_top"),
        F.sum(F.when(F.col("tag") == "t", gchars)).alias("_all_t"),
        F.sum(F.when((F.col("tag") == "d") & (F.col("cnt") > 1), gchars))
        .alias("_dup_d"),
        F.sum(F.when(F.col("tag") == "d", gchars)).alias("_all_d"),
    )
    lm = F.split(F.col("_lm"), "\x1f")
    nl = lm[0].cast("bigint")
    ndl = lm[1].cast("bigint")
    lc = lm[2].cast("bigint")
    dc = lm[3].cast("bigint")
    return agg.select(
        id_col,
        nl.alias("n_lines"),
        F.when(nl > 0, (nl - ndl).cast("double") / nl)
        .otherwise(0.0).alias("dup_line_frac"),
        F.when(lc > 0, (lc - dc).cast("double") / lc)
        .otherwise(0.0).alias("dup_line_char_frac"),
        F.coalesce(F.col("_top.gram"), F.lit("")).alias("top_gram"),
        F.coalesce(
            (F.col("_top.cnt") * F.length("_top.gram")).cast("double")
            / F.col("_all_t"), F.lit(0.0)).alias("top_gram_frac"),
        F.coalesce(
            F.coalesce(F.col("_dup_d"), F.lit(0)).cast("double")
            / F.col("_all_d"), F.lit(0.0)).alias("dup_gram_frac"),
    )


GOPHER_BULLETS = ["- ", "* ", "• "]
EN_ALPHA_RE = r"\p{L}"


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         line_sep: str = "\n",
                         min_words: int = 50, max_words: int = 100000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         max_bullet_frac: float = 0.9,
                         max_ellipsis_frac: float = 0.3,
                         min_alpha_frac: float = 0.8,
                         min_stop_hits: int = 2) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 Table A1) as pure in-row
    Catalyst — zero shuffle, rides the scan at any corpus size. Adds:
    ``n_words``, ``mean_word_len``, ``symbol_word_ratio`` ('#', '...'
    and the Unicode ellipsis '…' per word — the paper's rule covers
    both spellings), ``bullet_line_frac``, ``ellipsis_line_frac``
    (lines ending '...' or '…'),
    ``alpha_word_frac`` (words containing a letter — unicode ``\\p{L}``,
    identical in Java regex and RE2), ``stop_hits`` (English stopword
    occurrences), and ``gopher_pass`` (1 iff every rule passes, int for
    dialect-stable hashing). Thresholds are the paper's defaults,
    overridable per corpus."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(F.replace(t, F.lit(line_sep), F.lit(" ")), " "),
                    lambda x: x != "")
    lines = F.filter(F.split(t, _lit_re(line_sep)), lambda x: x != "")
    n_words = F.size(toks).cast("bigint")
    n_lines = F.size(lines)
    wchars = F.aggregate(toks, F.lit(0).cast("bigint"),
                         lambda a, x: a + F.length(x))
    mean_wl = F.when(n_words > 0,
                     wchars.cast("double") / n_words).otherwise(0.0)

    def _count(sub: str) -> Column:
        return ((F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit(""))))
                / len(sub)).cast("bigint")

    symbols = _count("#") + _count("...") + _count("…")
    sym_ratio = F.when(n_words > 0,
                       symbols.cast("double") / n_words).otherwise(0.0)
    def _is_bullet(x: Column) -> Column:
        cond = x.startswith(GOPHER_BULLETS[0])
        for p in GOPHER_BULLETS[1:]:
            cond = cond | x.startswith(p)
        return cond

    bullet = F.when(
        n_lines > 0,
        F.size(F.filter(lines, _is_bullet)).cast("double") / n_lines
    ).otherwise(0.0)
    ellipsis = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda x: x.endswith("...")
                        | x.endswith("…"))).cast("double")
        / n_lines).otherwise(0.0)
    alpha = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda x: x.rlike(EN_ALPHA_RE))).cast("double")
        / n_words).otherwise(0.0)
    stops = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_hits = F.size(F.filter(toks,
                                lambda x: F.array_contains(stops, x))
                       ).cast("bigint")
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_word_ratio", sym_ratio)
        .withColumn("bullet_line_frac", bullet)
        .withColumn("ellipsis_line_frac", ellipsis)
        .withColumn("alpha_word_frac", alpha)
        .withColumn("stop_hits", stop_hits)
    )
    passed = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") < max_symbol_ratio)
        & (F.col("bullet_line_frac") < max_bullet_frac)
        & (F.col("ellipsis_line_frac") < max_ellipsis_frac)
        & (F.col("alpha_word_frac") > min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("gopher_pass", passed.cast("int"))


def _lit_re(sep: str) -> str:
    """Regex-escape a literal separator for F.split (which is
    regex-based; DuckDB's string_split is literal — the escape keeps
    the two dialects on the same literal semantics)."""
    import re
    return re.escape(sep)


def normalize_nfc(df: DataFrame, text_col: str = "text",
                  out_col: str = "text_nfc") -> DataFrame:
    """Unicode NFC normalization (UAX #15 canonical composition) — the
    pass a Vietnamese-text pipeline runs BEFORE regex field matching:
    crawled text routinely carries DECOMPOSED base+combining-mark
    sequences ('e' U+0302 U+0323 for ệ), which fail literal matches
    against the composed patterns in fields.py's registry (the
    reference's regexes, ai_service.py:28-57, are composed literals).
    NFC — including canonical REORDERING of out-of-order combining
    marks — is not Catalyst-expressible, so this is this module's one
    exception to the no-Python rule: an Arrow-batched pandas UDF
    (pandas Series.str.normalize, one C-dispatched call per batch —
    never per-row Python in the Spark plan). NULL → ''. Scale shape:
    in-row map, rides the scan, zero shuffle. Driver-oracled
    byte-identical against DuckDB's utf8proc ``nfc_normalize``
    (query ``unicode_nfc_normalize``, incl. reordering cases). The
    plan-level coalesce OWNS the NULL → '' contract — the UDF never
    sees a null.

    Span-offset caveat: the extraction pipeline's char offsets index
    the text AS THE PARSER SAW IT (the reference's contract — it does
    not normalize, so neither does the pipeline). Normalizing the
    EXTRACTED text column here shifts composed characters and
    invalidates those offsets; to get offsets over NFC text, normalize
    the decoded payload BEFORE extraction instead (and accept the
    deliberate divergence from reference byte-parity)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # pragma: no cover — executor-side
        return s.str.normalize("NFC")

    return df.withColumn(out_col, _nfc(F.coalesce(F.col(text_col),
                                                  F.lit(""))))


def content_blocklist(df: DataFrame, words: list[str],
                      text_col: str = "text") -> DataFrame:
    """C4-style badword flag (Raffel et al. 2020 §2.2 drop documents
    containing any blocklist token; the UT1-blocklist shape): tokenize
    on non-alphanumeric runs (unicode classes — ``\\p{L}\\p{N}`` are
    RE2/Java-identical), lowercase, exact-token match against the
    (tiny, literal) blocklist. Adds ``n_blockwords`` (DISTINCT matched
    blocklist words — array_intersect dedups in both engines) and
    ``blocked`` (0/1). Pure in-row Catalyst: zero shuffle, zero joins,
    no regex-per-word scans — the blocklist lives in the plan as an
    array literal (fine for the C4 list; a 100k-entry blocklist would
    move to a broadcast join instead). Callers filter on ``blocked``;
    the flag form keeps the op lossless for audit queries."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                r"[^\p{L}\p{N}]+"),
        lambda x: x != "")
    bl = F.array(*[F.lit(w.lower()) for w in words])
    n = F.size(F.array_intersect(toks, bl)).cast("bigint")
    return df.withColumn("n_blockwords", n).withColumn(
        "blocked", (F.col("n_blockwords") > 0).cast("int"))


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", prefix_len: int = 64) -> DataFrame:
    """Cheap whole-doc fingerprints: min/max token hash + prefix hash —
    the exact-dup / shard-routing keys."""
    from .dedup import tokens
    tok = tokens(df, id_col, text_col)
    agg = tok.groupBy(id_col).agg(
        F.substring(F.min(F.md5("token")), 1, 16).alias("fp_min"),
        F.substring(F.max(F.md5("token")), 1, 16).alias("fp_max"),
    )
    pre = df.select(
        id_col, F.md5(F.substring(F.col(text_col), 1, prefix_len)).alias("fp_prefix"))
    return agg.join(pre, id_col)


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", window: int = 32,
                        stride: int = 16, keep: int = 2) -> DataFrame:
    """Winnowing-style rolling fingerprints: md5 over sliding windows,
    keep the k lexicographic minima — robust to small edits (the
    shingle-level near-dup primitive). One row per doc, fp1..fp{keep}."""
    pos = df.filter(F.length(text_col) >= window).select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.length(text_col) - (window - 1),
                             F.lit(stride))).alias("p"),
        F.col(text_col).alias("_t"),
    )
    grams = pos.select(
        id_col, F.md5(F.col("_t").substr(F.col("p"), F.lit(window))).alias("g")
    ).distinct()
    ranked = grams.withColumn(
        "rk", F.row_number().over(Window.partitionBy(id_col).orderBy("g"))
    ).filter(F.col("rk") <= keep)
    aggs = [
        F.max(F.when(F.col("rk") == i + 1, F.substring("g", 1, 16)))
        .alias(f"fp{i + 1}")
        for i in range(keep)
    ]
    return ranked.groupBy(id_col).agg(*aggs)
