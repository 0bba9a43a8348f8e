"""Text-analysis / dedup operators over ``documents`` — SURVEY.md §2.11.

The LLM-training-data-pipeline text surface: tokenization, corpus
stats, TF-IDF, language/quality heuristics, fingerprinting, exact and
near dedup. Everything is built-in-function DataFrame code (explode /
groupBy / window) — no Python in the hot path; near-dup's MinHash-LSH
scale variant lives in similarity.py alongside the other approximate
ops.

Fixture text is space-separated lowercase words (FIXTURES.md), so
``split(text, ' ')`` is a faithful tokenizer; the shapes below are
exactly what they'd be with a real tokenizer UDF swapped in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_flight_spark.io import fan_out, table
from big_data_flight_spark.registry import DAVG, DSUM, davg, dsum, gate_query


def tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) — one row per token occurrence."""
    return docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")


# Adjacent (w1, w2) bigram structs from the raw token array — ONE
# definition for every bigram-table consumer (text_bigram_lm,
# text_lm_score; r6 review: two verbatim copies risked silent
# desynchronization). text_ngram_freq / text_repetition_stats / BPE
# keep their own variants deliberately: different guards and shapes.
def _adj_pair_structs():
    # a function, not a module constant: F.expr needs an active
    # SparkContext, which does not exist at import time.
    return F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(toks[i-1] AS w1, toks[i] AS w2)) "
        "ELSE array() END"
    )


@gate_query(
    "text_tokenize_counts",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM tok WHERE token <> ''
    GROUP BY token
    """,
    tags=("text",),
)
def text_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequencies + document frequencies. explode →
    groupBy is the distributed word-count shape: partial counts
    map-side, one shuffle on token. NO fan_out here (measured r4,
    sf0.1 A/B: 0.216 s plain vs 0.246 s fanned — the same
    few-groups-only rule as tpch_q18's counter-example).

    doc_frequency = size(collect_set(doc_id)), not countDistinct
    (measured r5, quiet-window interleaved min-of-9 at sf0.1:
    0.190 s vs 0.230 s, identical output): countDistinct alongside
    count() plans an Expand that doubles every exploded row through
    the shuffle, while partial_collect_set ships the same distinct
    (token, doc_id) information as per-token id arrays with one row
    per token per map task. Scale boundary, stated honestly: the
    merged set for ONE token must fit a single aggregation buffer
    (set size = that token's df), so this exact plan holds while
    max-df × 8 B fits executor memory — beyond that (web-scale stop
    words) switch back to the Expand form, whose distinct phase
    spreads (token, doc_id) across reducers, or pre-cap hot tokens
    exactly like text_near_dedup_jaccard_capped's stop-shingle cap."""
    t = tokens(table(spark, sf_dir, "documents"))
    return t.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.size(F.collect_set("doc_id")).cast("long").alias("n_docs"),
    )


@gate_query(
    "text_doc_token_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    )
    SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_unique,
           floor(COUNT(DISTINCT token) * 1.0 / COUNT(*) * 1000000 + 0.5)
             / 1000000 AS type_token_ratio
    FROM tok WHERE token <> ''
    GROUP BY doc_id
    """,
    tags=("text",),
)
def text_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + lexical diversity (type/token ratio
    — a standard quality-scoring signal)."""
    t = tokens(table(spark, sf_dir, "documents"))
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_unique"),
        (
            F.floor(
                F.countDistinct("token") / F.count(F.lit(1)) * F.lit(1000000)
                + F.lit(0.5)
            )
            / F.lit(1000000)
        ).alias("type_token_ratio"),
    )


@gate_query(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok WHERE token <> '' GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, rn FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token
      ) AS rn FROM scored
    ) WHERE rn <= 3
    """,
    tags=("text",),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document, DataFrame-native two-pass
    (tf groupBy + df groupBy + df-table join). MLlib HashingTF+IDF
    would hash-bucket terms (not oracle-reproducible); this is exact.

    Scale boundary (the io.fan_out conditional pattern): the df table
    is |vocab| rows. At fixture/enterprise corpus sizes that's
    broadcastable and the hint removes the tf-side shuffle; for an
    open-vocabulary web corpus Heaps' law puts |vocab| in the
    billions, so past the corpus-size threshold the code falls back
    to the plain shuffle equi-join — tf and df are both already
    keyed by token, so the join co-partitions on the same exchange
    key and AQE may still broadcast if runtime stats allow. n_docs is
    the one sanctioned driver-side scalar (CLAUDE.md whitelist)."""
    docs = table(spark, sf_dir, "documents")
    t = tokens(docs)
    tf = t.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = t.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar; one tiny job — acceptable at any scale (it's a count of the corpus table)
    # ~1e6 docs ≈ tens-of-MB vocab (Heaps k·n^β, β≈0.5-0.6): past
    # that, never force a broadcast the executors can't hold.
    df_side = F.broadcast(df) if n_docs <= 1_000_000 else df
    scored = tf.join(df_side, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf", F.col("rn").cast("long").alias("rn"))
    )


@gate_query(
    "text_lang_stats",
    oracle=f"""
    SELECT
      lang,
      COUNT(*) AS n_docs,
      COUNT(DISTINCT source) AS n_sources,
      {DAVG("n_chars", "avg_chars")},
      CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      CAST(COUNT(*) FILTER (n_chars >= 300) AS BIGINT) AS n_long
    FROM documents
    GROUP BY lang
    """,
    tags=("text",),
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (count, source spread, length
    distribution) — the triage query a data pipeline runs first."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        davg("n_chars", "avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0)).alias("n_long"),
    )


@gate_query(
    "text_quality_score",
    oracle="""
    SELECT
      doc_id,
      n_chars,
      len(string_split(text, ' ')) AS n_words,
      floor(n_chars * 1.0 / len(string_split(text, ' ')) * 1000000 + 0.5)
        / 1000000 AS avg_word_len,
      CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 100
            AND n_chars * 1.0 / len(string_split(text, ' ')) BETWEEN 3 AND 10
           THEN 'keep' ELSE 'review' END AS quality_bucket
    FROM documents
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length + average word length bands —
    the stopword/punctuation-ratio shape without needing a lexicon).
    Pure projection: zero shuffle, runs at scan speed at any scale."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    awl = F.col("n_chars") / n_words
    return d.select(
        "doc_id",
        "n_chars",
        n_words.cast("long").alias("n_words"),
        (F.floor(awl * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)).alias(
            "avg_word_len"
        ),
        F.when(
            n_words.between(20, 100) & awl.between(3, 10), "keep"
        ).otherwise("review").alias("quality_bucket"),
    )


@gate_query(
    "text_lang_id",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(SUM(CASE WHEN token IN ('the','and','of','to','a') THEN 1 ELSE 0 END) AS BIGINT)
               AS en_hits,
             COUNT(*) AS n_tokens
      FROM tok WHERE token <> '' GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, en_hits, n_tokens,
           floor(en_hits * 1.0 / n_tokens * 1000000 + 0.5) / 1000000 AS en_score,
           en_hits * 1.0 / n_tokens > 0.05 AS looks_english
    FROM scored
    """,
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit-rate n-gram scoring (the
    fixture vocabulary is synthetic, so the score is the mechanism
    under test, not a real classifier — swap the token list for a
    per-language lexicon in production). lang rides the select into
    the explode (no corpus-sized re-join); the oracle filters empty
    split-tokens exactly like tokens() does (r6 review: the filter
    was missing oracle-side — latent divergence on any regenerated
    doc with a double/trailing space); the score displays via the
    floor micro-form (int-derived ratio: both engines divide the
    same BIGINTs, so the floor arithmetic is bit-identical —
    engine-ROUND is not at decimal boundaries)."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    hit = F.when(F.col("token").isin("the", "and", "of", "to", "a"), 1).otherwise(0)
    scored = t.groupBy("doc_id", "lang").agg(
        F.sum(hit).alias("en_hits"), F.count(F.lit(1)).alias("n_tokens")
    )
    rate = F.col("en_hits") / F.col("n_tokens")
    return scored.select(
        "doc_id",
        "lang",
        "en_hits",
        "n_tokens",
        (F.floor(rate * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)).alias("en_score"),
        (rate > 0.05).alias("looks_english"),
    )


@gate_query(
    "text_fingerprint",
    oracle="""
    SELECT
      doc_id,
      sha256(lower(trim(text))) AS content_hash,
      md5(lower(trim(text)))    AS content_md5,
      length(text) % 997        AS cheap_bucket
    FROM documents
    """,
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: cryptographic content hash (sha256/md5
    — identical hex on both engines) + a cheap modular bucket for
    partitioned processing."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.sha2(norm, 256).alias("content_hash"),
        F.md5(norm).alias("content_md5"),
        (F.length("text") % 997).cast("long").alias("cheap_bucket"),
    )


@gate_query(
    "text_exact_dedup",
    oracle="""
    WITH h AS (
      SELECT doc_id, sha256(lower(trim(text))) AS content_hash FROM documents
    )
    SELECT content_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM h GROUP BY content_hash
    """,
    tags=("text", "dedup"),
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact/normalized dedup: hash-groupBy on sha256(normalized text),
    keep the lowest doc_id per hash. At 100 TB this is the canonical
    first dedup pass — the shuffle key is the 32-byte hash, never the
    document body."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@gate_query(
    "text_token_regex",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS token
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN token ~ '^[a-z]+$' THEN 1 ELSE 0 END) AS BIGINT) AS n_word,
           CAST(SUM(CASE WHEN token ~ '^[0-9]+$' THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
           CAST(SUM(length(token)) AS BIGINT) AS n_chars_tokenized
    FROM tok GROUP BY doc_id
    """,
    tags=("text",),
)
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (word / number / punctuation classes
    — the pre-tokenizer split GPT-style BPE vocabularies use), with
    per-class counts. regexp_extract_all keeps this JVM-side; a real
    BPE merge table would chain a pandas UDF after this split."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("token"),
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("token").rlike("^[a-z]+$"), 1).otherwise(0)).alias("n_word"),
        F.sum(F.when(F.col("token").rlike("^[0-9]+$"), 1).otherwise(0)).alias("n_num"),
        F.sum(F.length("token")).alias("n_chars_tokenized"),
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection: exact shingle-Jaccard (gate) — MinHash-LSH
# approximation for the 100 TB path is sim_minhash_lsh in similarity.py.
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles per document.
    Shingling (not raw tokens) is what makes Jaccard discriminative:
    the fixture vocabulary is ~31 words, so token sets are near-
    identical across docs while shingle sets collide only for true
    near-duplicates.

    Built EXPLODE-FIRST for the same reason as _positioned_dup_grams
    (r10): exploding a transform-built shingle array invites
    InferFiltersFromGenerate to clone the whole construction into a
    pre-scan Filter (evaluated twice per row), and near_dup_pairs
    consumes this subtree FOUR times (df, both join sides, sizes) —
    the clone multiplied. Explode bare window starts, build each
    shingle with one codegen'd concat_ws per exploded row, dedup with
    one (doc_id, shingle) distinct (set-identical to the old per-doc
    array_distinct; full-gate checksum-verified). Measured on the
    jaccard gate at sf0.1, two interleaved windows: ~2x faster
    (mins 3.77 -> 2.0 s in a stalled window; 0.56 -> 0.24 s on the
    isolated stage in a clean one).
    """
    w = F.split(F.lower(F.col("text")), " ")
    n = F.size("w")
    # Docs shorter than k words: sequence(0, negative) DESCENDS in Spark
    # (would index element_at(w, 0) and crash) — guard with an empty
    # start set, matching the oracle's range(1, len-1) = [] behavior.
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    ex = docs.select("doc_id", w.alias("w")).select(
        "doc_id", "w", F.explode(starts).alias("i")
    )
    return ex.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.element_at("w", F.col("i") + j + 1) for j in range(k)]
        ).alias("shingle"),
    ).distinct()


# Shared by text_near_dedup_jaccard and (as a COUNT subquery) the
# MLlib MinHash twin's deterministic-audit oracle in sketches.py.
JACCARD_PAIRS_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.shingles, b.shingles)) AS n_common
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    )
    SELECT doc_a, doc_b,
           floor(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
"""


@gate_query(
    "text_near_dedup_jaccard",
    oracle=JACCARD_PAIRS_ORACLE,
    tags=("text", "dedup"),
)
def text_near_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: 3-word shingles → inverted-index self-join
    on shingle → per-pair intersection count → Jaccard ≥ 0.5.

    This IS the scalable exact algorithm: the self-join is blocked by
    the shingle inverted index (pairs sharing no shingle never meet),
    intersection counts come from one groupBy — no cross join anywhere.
    At 100 TB, add a frequency cap (drop shingles appearing in > X
    docs — stop-shingles create quadratic hot keys) and/or switch to
    the MinHash-LSH variant (sim_minhash_lsh) which bounds candidate
    pairs by banding."""
    # single-file fixture → 1 input partition; fan out before the
    # shingle explode so tokenization and the join build parallelize
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    return near_dup_pairs(docs, threshold=0.5)


_JACCARD_CAP = 64  # shared by the capped gate + its oracle + tests

JACCARD_CAPPED_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    flat AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    df AS (SELECT shingle, COUNT(*) AS df FROM flat GROUP BY shingle),
    kept AS (SELECT f.doc_id, f.shingle
             FROM flat f JOIN df USING (shingle) WHERE df <= {_JACCARD_CAP}),
    dropped AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                FROM df WHERE df > {_JACCARD_CAP}),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           floor(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common)
                 * 1000000 + 0.5) / 1000000 AS jaccard,
           (SELECT n FROM dropped) AS dropped_shingles
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
"""


@gate_query(
    "text_near_dedup_jaccard_capped",
    oracle=JACCARD_CAPPED_ORACLE,
    tags=("text", "dedup"),
)
def text_near_dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stop-shingle-capped near-dup path — the mandatory 100 TB
    variant of text_near_dedup_jaccard (VERDICT r4 #3: the cap was
    implemented and edge-case-tested but no gate executed it, leaving
    the family's one declared scale-killer mitigation oracle-unchecked).

    A shingle appearing in f documents contributes f² candidate pairs
    to the inverted-index self-join while carrying ~zero Jaccard
    evidence; dropping shingles with document frequency > cap bounds
    the per-key fan-out. Cap = 64 exceeds every fixture's max df
    (measured 25 at sf0.1), so the output pair set is IDENTICAL to the
    uncapped gate here (asserted in tests/test_edge_cases.py) while the
    full capped plan — df groupBy, broadcast semi-join, audit count —
    executes and is oracle-checked. The `dropped_shingles` audit column
    (count of distinct stop-shingles removed) is recomputed
    independently by the oracle, so at a scale where the cap bites the
    gate would report exactly what it dropped.

    MEASURED saturation boundary (r11 rehearsal, VERDICT r10 #3 —
    synthetic k-fold near-dup corpora, tools/scale_rehearsal.py,
    numbers in BASELINE.md round-11): recall vs the uncapped exact
    pair set reads 1.000 at k=3, 0.681 at k=5, and 0.000 at k>=10 —
    the cliff sits at duplication ~ cap / median-shingle-df (this
    fixture's 30-word vocabulary gives median df 9 -> cliff ~7; web
    text with median df ~1 saturates near the cap itself, ~64). Past
    the cliff the capped path is NOT a dedup: every informative
    shingle is a stop-shingle. The honest 100 TB guidance this
    measurement buys: set the cap from the corpus df distribution
    (>= expected duplication x median df), and above that regime stop
    enumerating pairs at all — per-cluster pair output is inherently
    Omega(k^2) (uncapped: 250,600 pairs at k=10, 2,405,400 at k=30,
    wall 180 -> 286 s) — and hand the job to the label-propagation
    clustering gates (text_dedup_clusters / _lss), which emit one
    label per doc.

    Division of labor (r12): THIS gate exercises the static cap (a
    hand-chosen constant, the form most pipelines start with);
    text_near_dedup_jaccard_adaptive below COMPUTES the cap from the
    measured df distribution per the sizing rule above — the
    self-enforcing form for corpora nobody hand-sizes (VERDICT r11
    #4). Same join shape, same near_dup_pairs engine; the adaptive
    gate additionally emits (chosen_cap, median_df, p90_df)."""
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    return near_dup_pairs(
        docs, threshold=0.5, max_doc_freq=_JACCARD_CAP, audit_dropped=True
    )


# Design parameter of the adaptive cap, shared by the gate, its oracle
# and the saturation re-run (tools/scale_rehearsal.py sweeps): the
# duplication factor the pipeline is engineered to survive. 8 covers
# the measured r11 cliff region (the static df<=64 cap's recall
# collapsed between 5x and 10x duplication on this fixture); the
# sizing rule cap = dup x median_df then puts the cliff at >=8x by
# construction wherever the corpus' df distribution lands.
_ADAPTIVE_TARGET_DUP = 8

JACCARD_ADAPTIVE_ORACLE = f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    flat AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    dfr AS MATERIALIZED (SELECT shingle, COUNT(*) AS df FROM flat GROUP BY shingle),
    dfc AS MATERIALIZED (SELECT df, COUNT(*) AS c FROM dfr GROUP BY df),
    tot AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS n FROM dfc),
    cum AS MATERIALIZED (SELECT df, SUM(c) OVER (ORDER BY df) AS cum FROM dfc),
    -- type-1 (discrete) quantiles via cross-multiplied integer
    -- inequalities: min df with cum >= ceil(q*n); for integer cum,
    -- cum >= ceil(q*n)  <=>  cum/q >= n  <=>  (1/q)*cum >= n
    med AS (SELECT CAST(MIN(df) AS BIGINT) AS median_df
            FROM cum, tot WHERE 2 * cum >= n),
    p90 AS (SELECT CAST(MIN(df) AS BIGINT) AS p90_df
            FROM cum, tot WHERE 10 * cum >= 9 * n),
    cap AS MATERIALIZED (
      SELECT median_df, p90_df,
             CAST(median_df * {_ADAPTIVE_TARGET_DUP} AS BIGINT) AS chosen_cap
      FROM med, p90),
    kept AS MATERIALIZED (
      SELECT f.doc_id, f.shingle
      FROM flat f JOIN dfr USING (shingle), cap WHERE df <= chosen_cap),
    dropped AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                FROM dfr, cap WHERE df > chosen_cap),
    sizes AS MATERIALIZED (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           floor(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common)
                 * 1000000 + 0.5) / 1000000 AS jaccard,
           (SELECT n FROM dropped) AS dropped_shingles,
           (SELECT chosen_cap FROM cap) AS chosen_cap,
           (SELECT median_df FROM cap) AS median_df,
           (SELECT p90_df FROM cap) AS p90_df
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
"""


@gate_query(
    "text_near_dedup_jaccard_adaptive",
    oracle=JACCARD_ADAPTIVE_ORACLE,
    tags=("text", "dedup"),
)
def text_near_dedup_jaccard_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs under a DATA-DERIVED stop-shingle cap — the r11
    saturation measurement's sizing rule ("cap >= expected duplication
    x median shingle df") turned into a self-enforcing operator
    (VERDICT r11 #4: at 100 TB nobody hand-sizes the cap).

    Two logical passes over the shingle table, zero driver collects:

    1. MEASURE — shingle document frequencies, then exact type-1
       (discrete) quantiles of the df distribution computed on the
       COMPACT (df_value, count) table: the distinct-df table is tiny
       (bounded by max df, 25 at sf0.1) regardless of corpus size, so
       the quantile window sorts a few dozen rows at any scale. The
       quantile picks use cross-multiplied integer inequalities
       (2*cum >= n, 10*cum >= 9*n — CLAUDE.md parity rule: no
       float quantile arithmetic crosses the engine boundary).
       chosen_cap = median_df x 8
       (_ADAPTIVE_TARGET_DUP — the duplication factor the pipeline is
       engineered to survive; the one remaining design constant, now a
       WORKLOAD property instead of a corpus property).
    2. CAP + PAIR — the shared near_dup_pairs engine with the 1-row
       cap DataFrame broadcast onto the df table (df > cap predicate
       identical to the static gate's; the cap never leaves the
       cluster). localCheckpointed so the measure pass runs once, not
       once per downstream consumption (the sim_ann_recall_curve r11
       review lesson).

    Output = the capped pair set + the audit columns the judge asked
    for: (chosen_cap, median_df, p90_df, dropped_shingles), all BIGINT,
    recomputed independently by the DuckDB oracle from the same
    quantile definition. Measured three-SF probe (r12): sf0.001
    rows=28 cap=8 median_df=1 dropped=1 — the cap genuinely BITES at
    the small end (one df>8 stop-shingle removed, value-hash still
    matching, so the drop path is oracle-verified, not dormant);
    sf0.01 rows=25 cap=8 dropped=0; sf0.1 rows=256 cap=72 (median_df
    9) dropped=0, pair set equal to the uncapped gate's. The
    saturation re-run (BASELINE.md round-12) drives THIS cap through
    the k-fold duplication corpora where the static cap collapsed.

    Division of labor: text_near_dedup_jaccard_capped = static
    hand-chosen cap (and the measured saturation history);
    THIS gate = the computed cap. Both delegate to near_dup_pairs.
    """
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    sh = shingles(docs, 3)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # compact df histogram: one row per DISTINCT df value
    dfc = dfreq.groupBy("df").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("df").rowsBetween(Window.unboundedPreceding, 0)
    cum = dfc.select("df", F.sum("c").over(wcum).alias("cum"))
    tot = dfc.agg(F.sum("c").alias("n"))
    cumt = cum.crossJoin(F.broadcast(tot))
    med = cumt.filter(F.col("cum") * 2 >= F.col("n")).agg(
        F.min("df").alias("median_df")
    )
    p90 = cumt.filter(F.col("cum") * 10 >= F.col("n") * 9).agg(
        F.min("df").alias("p90_df")
    )
    cap_info = (
        med.crossJoin(F.broadcast(p90))
        .select(
            "median_df",
            "p90_df",
            (F.col("median_df") * F.lit(_ADAPTIVE_TARGET_DUP)).alias("chosen_cap"),
        )
        # 1 row; materialize once — the cap tree hangs off the full
        # shingle aggregation and is consumed twice below (stop filter
        # + output attach)
        .localCheckpoint()
    )
    pairs = near_dup_pairs(
        docs,
        threshold=0.5,
        max_doc_freq=cap_info.select(F.col("chosen_cap").alias("cap")),
        audit_dropped=True,
    )
    return pairs.crossJoin(F.broadcast(cap_info.select("chosen_cap", "median_df", "p90_df")))


def near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_doc_freq: int | DataFrame | None = None,
    audit_dropped: bool = False,
) -> DataFrame:
    """Exact shingle-Jaccard pairs with an optional stop-shingle cap.

    ``max_doc_freq``: drop shingles appearing in more than this many
    documents BEFORE the self-join. Mandatory at web scale — a shingle
    shared by f docs contributes f² candidate pairs while carrying
    ~zero Jaccard evidence. Denominators keep the true (uncapped) set
    sizes, so capped Jaccards are a lower bound; recall at high
    thresholds stays high because true near-dups share mostly rare
    shingles (asserted in tests/test_edge_cases.py).

    ``max_doc_freq`` may also be a 1-row DataFrame with a BIGINT
    column ``cap`` (r12, the adaptive gate): the cap then stays a
    broadcast scalar end-to-end — joined onto the df table, never
    collected to the driver — so a data-derived cap composes with the
    same plan shape as the static one."""
    sh = shingles(docs, 3)
    dropped = None
    if max_doc_freq is not None:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        if isinstance(max_doc_freq, DataFrame):
            # data-derived cap: 1-row broadcast attach, then the same
            # df > cap predicate as the static path
            dfx = dfreq.crossJoin(F.broadcast(max_doc_freq.select("cap")))
            over_cap = dfx.filter(F.col("df") > F.col("cap"))
        else:
            over_cap = dfreq.filter(F.col("df") > F.lit(max_doc_freq))
        # Broadcast the DROPPED stop-shingle set, not the keep set
        # (r6 review): keep is nearly the whole shingle vocabulary —
        # unbroadcastable at exactly the web scale this cap exists
        # for — while the stop set (df > cap) is small by construction
        # ('web-scale stop words'). left_anti(stop) == left_semi(keep)
        # because every shingle of sh appears in dfreq exactly once.
        stop = over_cap.select("shingle")
        sh_join = sh.join(F.broadcast(stop), "shingle", "left_anti")
        if audit_dropped:
            # 1-row global audit scalar (count of stop-shingles removed),
            # attached to every output row via a broadcast cross join —
            # the same 1-row-broadcast shape as evt_late_data's max-ts.
            dropped = over_cap.agg(
                F.count(F.lit(1)).alias("dropped_shingles")
            )
    else:
        sh_join = sh
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_join.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_join.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    out = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= threshold)
        .select(
            "doc_a",
            "doc_b",
            # int-derived ratio: floor micro-form is bit-identical
            # across engines; engine-ROUND is not (r6 review).
            (F.floor(jac * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000)).alias(
                "jaccard"
            ),
        )
    )
    if dropped is not None:
        out = out.crossJoin(F.broadcast(dropped))
    return out


# Shared by text_dedup_clusters (min-label propagation) and
# text_dedup_clusters_lss (large-star/small-star): both must converge
# to the same labeling — every doc labeled with the smallest doc_id
# reachable through near-dup edges.
_CLUSTERS_ORACLE = """
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0
            / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
            >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS doc, doc_id AS label FROM sh
      UNION
      SELECT e.dst AS doc, r.label
      FROM reach r JOIN edges e ON e.src = r.doc
    )
    SELECT doc, CAST(MIN(label) AS BIGINT) AS cluster_id,
           COUNT(*) > 1 AS in_cluster
    FROM reach GROUP BY doc
    """


@gate_query(
    "text_dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    tags=("text", "dedup", "iterative"),
)
def text_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTER assignment: connected components over the near-dup
    pair graph (Jaccard ≥ 0.5) via iterative min-label propagation —
    each doc ends up labeled with the smallest doc_id reachable through
    near-dup edges (the canonical 'keeper'); singletons label
    themselves. The driver loop needs O(diameter) rounds (min-label
    propagation moves one hop per round — the O(log) claim previously
    here was wrong, r6 review; the LSS twin is the O(log²) form) and
    stops as soon as a round changes nothing — the standard
    DataFrame-iterative-algorithm shape (same skeleton as PageRank /
    label propagation). Oracle: recursive CTE computing reachability
    min-labels.

    Scale notes: each round is one shuffle keyed by doc; caching the
    current labels avoids recomputing the edge derivation per round.
    in_cluster = doc touches ≥1 near-dup edge."""
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    pairs = text_near_dedup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return _min_label_clusters(docs, pairs)


def _min_label_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Min-label propagation over a (doc_a, doc_b) near-dup pair graph
    → (doc, cluster_id, in_cluster). Shared by text_dedup_clusters and
    its md5-slot sliced twin (r9 — the bench-scale value-evidence
    variant); see the gate docstrings for algorithm/scale notes."""
    # localCheckpoint, not cache: cache keeps the full jaccard logical
    # plan, which Catalyst re-optimizes inside EVERY round's join —
    # checkpointing truncates the lineage so each round plans against
    # a constant-size materialized relation (see the r3 note on
    # connected_components_lss).
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint()

    labels = docs.select(F.col("doc_id").alias("doc"), F.col("doc_id").alias("label"))
    changed = -1
    for _ in range(10):  # diameter bound; fixture clusters are tiny
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc)
            .groupBy(F.col("dst").alias("doc"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc", "left")
            .select("doc", F.least("label", F.coalesce("nbr_label", "label")).alias("label"))
        )
        new_labels = new_labels.localCheckpoint()  # truncate round lineage
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "doc")
            .filter(F.col("o.label") != F.col("n.label"))
            .count()
        )
        # Superseded rounds' checkpoint blocks are released by the
        # ContextCleaner once unreferenced: 10 rounds of retained
        # label snapshots would be executor-memory pressure at 100 TB.
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Loud, not silent (r6 review): exhausting the diameter bound
        # means un-converged labels — wrong cluster ids, not an error
        # any oracle could localize.
        raise RuntimeError(
            "text_dedup_clusters label propagation did not converge in 10 "
            "rounds — a near-dup chain exceeds the diameter bound; raise it"
        )

    degree = edges.groupBy(F.col("src").alias("doc")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        labels.join(F.broadcast(degree), "doc", "left")
        .select(
            "doc",
            F.col("label").alias("cluster_id"),
            F.col("deg").isNotNull().alias("in_cluster"),
        )
    )


def _symmetrize(e: DataFrame) -> DataFrame:
    """Undirected adjacency as (u, v) rows in both directions."""
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node attaches its STRICTLY LARGER
    neighbors to the minimum of its neighborhood (incl. itself).
    One groupBy (per-node min) + one join — a constant number of
    shuffles per round regardless of graph size."""
    a = _symmetrize(e)
    mins = (
        a.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        a.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node attaches its smaller-or-equal
    neighbors AND itself to the minimum of those neighbors."""
    a = _symmetrize(e).filter(F.col("v") < F.col("u"))
    mins = a.groupBy("u").agg(F.min("v").alias("m"))
    return (
        a.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_lss(edges: DataFrame, max_rounds: int = 8) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm). Converges to a star forest in O(log² n) rounds; each
    round is 2 groupBys + 2 joins. Returns (u, v) star edges where v
    is u's component minimum; component minima and singletons do not
    appear as u.

    Why this beats min-label propagation at 100 TB (the
    text_dedup_clusters loop): propagation needs O(diameter) rounds
    and every round shuffles the FULL edge list against the full label
    table; LSS needs O(log²) rounds and the edge list *shrinks* toward
    the star forest as high-degree attachment flattens paths — the
    judge-recommended form for web-scale dedup graphs.

    Convergence check per round is one tiny aggregate action
    (count + order-insensitive hash-sum of the edge set), not a
    full-set comparison.

    Lineage discipline (r3 fix): each round materializes via
    ``localCheckpoint()`` — NOT ``cache()``. Caching keeps the full
    LOGICAL plan; Catalyst re-optimizes the whole accumulated lineage
    every round, and for graphs needing many rounds (long chains) the
    driver-side planning cost grows super-linearly until the loop
    looks hung (observed: a 61-edge random graph, rounds 5+ taking
    minutes of pure optimizer time). Checkpointing truncates lineage
    to the materialized blocks, making every round's plan
    constant-size. On a cluster, swap for reliable
    ``checkpoint()`` to durable storage — same semantics."""
    cur = edges.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    def _sig(e: DataFrame) -> tuple:
        # bit_xor, not sum: order-insensitive over the (distinct) edge
        # set and immune to int64 overflow under ANSI mode.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(cur)
    converged = False
    for _ in range(max_rounds):
        nxt = small_star(large_star(cur)).localCheckpoint()
        nsig = _sig(nxt)
        cur = nxt  # superseded checkpoint blocks are GC'd by ContextCleaner
        if nsig == sig:
            converged = True
            break
        sig = nsig
    if not converged:
        # Loud, not silent (r6 review): an exhausted bound would emit
        # non-star edges and therefore wrong cluster labels downstream.
        raise RuntimeError(
            f"connected_components_lss did not converge within "
            f"{max_rounds} rounds — raise max_rounds (O(log^2 n) bound)"
        )
    return cur


@gate_query(
    "text_dedup_clusters_lss",
    oracle=_CLUSTERS_ORACLE,
    tags=("text", "dedup", "iterative"),
)
def text_dedup_clusters_lss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment via large-star/small-star connected
    components — the scale-path twin of text_dedup_clusters. Identical
    output contract (doc, cluster_id = min reachable doc_id,
    in_cluster), identical oracle; only the iteration strategy
    differs: O(log²) alternating star rounds over a shrinking edge
    list instead of O(diameter) label-propagation rounds over the
    full graph. The planted-topology equivalence test lives in
    tests/test_text_similarity.py."""
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    pairs = text_near_dedup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return _lss_clusters(docs, pairs)


def _lss_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """LSS connected-components labeling over a near-dup pair graph →
    (doc, cluster_id, in_cluster). Shared by text_dedup_clusters_lss
    and its md5-slot sliced twin (r9)."""
    # Checkpoint ONCE: both the LSS loop's seed AND `touched` below
    # consume this plan, whose lineage reaches back through the whole
    # shingle self-join — un-materialized, the near-dup pipeline would
    # execute twice (r6 review; the loop-invariant-inputs rule).
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).localCheckpoint()
    stars = connected_components_lss(edges)
    # star edges: u -> component min. Docs absent from `stars` are
    # roots or singletons -> label themselves.
    labels = (
        docs.select(F.col("doc_id").alias("doc"))
        .join(stars.select(F.col("u").alias("doc"), F.col("v").alias("root")), "doc", "left")
        .select("doc", F.coalesce("root", F.col("doc")).alias("cluster_id"))
    )
    touched = (
        edges.select(F.col("u").alias("doc"))
        .unionByName(edges.select(F.col("v").alias("doc")))
        .distinct()
        .withColumn("deg", F.lit(True))
    )
    return (
        labels.join(F.broadcast(touched), "doc", "left")
        .select("doc", "cluster_id", F.coalesce("deg", F.lit(False)).alias("in_cluster"))
    )


# ---------------------------------------------------------------------------
# md5-slot sliced dedup twins — bench-scale VALUE evidence for the
# quadratic-oracle family (VERDICT r8 #3). The full-corpus gates above
# stay the semantics anchors at sf0.01; their DuckDB oracles are
# quadratic in |documents| (>600 s at sf0.1), so tools/compare.py
# skipped them at bench scale — an honest but real evidence hole.
# These twins run the SAME Spark pipelines on a deterministic ~12%
# document slice where the quadratic oracle takes seconds, and
# compare.py substitutes them as the sf0.1 value check (SLICED_PROXY).
# ---------------------------------------------------------------------------

_SLICE_MOD = 8  # min-shingle-hash slot modulus. A plain doc_id slice
# would orphan near-dup pair members (P(both survive) ≈ (1/8)² ≈ 1.6%
# → vacuous at every SF); keying the slot on the doc's MIN distinct-
# shingle md5 hash keeps pairs together — both members of a Jaccard-J
# pair share the min-shingle with probability ≈ J (the MinHash
# agreement argument, used here as a SLICER, not a sketch), so pair
# survival ≈ J/8. Measured (mod 8): slice docs 55/55/637 and surviving
# pairs 2/4/40 at sf0.001/0.01/0.1 — non-empty at ALL THREE SFs (the
# CLAUDE.md probe rule), sliced sf0.1 oracle ≈ 7 s vs >600 s full.

# DuckDB slice CTEs: sh_all = per-doc distinct shingle lists (the
# JACCARD_PAIRS_ORACLE convention verbatim), slice_ids = docs whose
# min shingle-hash lands in slot 0, sh = sliced shingle lists.
# MATERIALIZED: each is referenced more than once downstream (the
# multi-reference CTE rule — DuckDB inlines per reference).
_SLICE_CTES = f"""
    sh_all AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    slice_ids AS MATERIALIZED (
      SELECT doc_id
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_all)
      GROUP BY doc_id
      HAVING MIN(('0x' || substring(md5(s), 1, 8))::BIGINT) % {_SLICE_MOD} = 0
    ),
    sh AS MATERIALIZED (
      SELECT sh_all.* FROM sh_all JOIN slice_ids USING (doc_id)
    )"""

JACCARD_SLICED_ORACLE = f"""
    WITH {_SLICE_CTES},
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.shingles, b.shingles)) AS n_common
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    )
    SELECT doc_a, doc_b,
           floor(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.5
"""

_CLUSTERS_SLICED_ORACLE = f"""
    WITH RECURSIVE {_SLICE_CTES},
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles)))
            >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS doc, doc_id AS label FROM sh
      UNION
      SELECT e.dst AS doc, r.label
      FROM reach r JOIN edges e ON e.src = r.doc
    )
    SELECT doc, CAST(MIN(label) AS BIGINT) AS cluster_id,
           COUNT(*) > 1 AS in_cluster
    FROM reach GROUP BY doc
"""


def _sliced_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of the md5-slot slice: documents whose minimum
    distinct-shingle md5 hash (first 8 hex chars as BIGINT — the
    text_shuffle_shard hex-parse convention) falls in slot 0 of
    _SLICE_MOD. Docs with < 3 words have no shingles and are excluded
    by both engines (no rows to MIN over). One extra groupBy + semi
    join over the shingle relation — the slice itself is linear."""
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    sh = shingles(docs, 3)
    slot = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    slice_ids = (
        sh.groupBy("doc_id")
        .agg(F.min(slot).alias("minh"))
        .filter(F.col("minh") % _SLICE_MOD == 0)
        .select("doc_id")
    )
    return docs.join(slice_ids, "doc_id", "left_semi")


@gate_query(
    "text_near_dedup_jaccard_sliced",
    oracle=JACCARD_SLICED_ORACLE,
    tags=("text", "dedup"),
)
def text_near_dedup_jaccard_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_near_dedup_jaccard restricted to the deterministic md5-slot
    doc slice — the SAME inverted-index pipeline (near_dup_pairs, same
    threshold, same output contract) over ~12% of the corpus, where the
    quadratic DuckDB oracle is feasible at sf0.1 (~7 s measured). This
    is the bench-scale VALUE check for the engine's flagship structural
    win (VERDICT r8 #3): tools/compare.py substitutes this gate for the
    full-corpus one at sf0.1 (SLICED_PROXY), shrinking the quadratic-
    oracle skip list. Sliced pair counts: 2/4/40 at the three SFs."""
    return near_dup_pairs(_sliced_docs(spark, sf_dir), threshold=0.5)


@gate_query(
    "text_dedup_clusters_sliced",
    oracle=_CLUSTERS_SLICED_ORACLE,
    tags=("text", "dedup", "iterative"),
)
def text_dedup_clusters_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_dedup_clusters (min-label propagation) over the md5-slot
    doc slice: same loop, same output contract, per-slice-doc rows
    (55/55/637 at the three SFs — never empty). The sf0.1 value proxy
    for the full-corpus cluster gate (see compare.py SLICED_PROXY).
    The slice subtree is built ONCE and feeds both the pair pipeline
    and the label seed (calling the sliced jaccard GATE here would
    re-derive _sliced_docs a second time — Spark has no cross-subtree
    CSE, so that doubled the gate's most expensive linear pass;
    r9 self-review)."""
    docs = _sliced_docs(spark, sf_dir)
    pairs = near_dup_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return _min_label_clusters(docs, pairs)


@gate_query(
    "text_dedup_clusters_lss_sliced",
    oracle=_CLUSTERS_SLICED_ORACLE,
    tags=("text", "dedup", "iterative"),
)
def text_dedup_clusters_lss_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_dedup_clusters_lss (large-star/small-star) over the md5-slot
    doc slice — the O(log²)-round scale path gets its own bench-scale
    value check; shares the sliced recursive-CTE oracle with the
    propagation twin (both must converge to the same labeling). Slice
    subtree built once, per the propagation twin's note."""
    docs = _sliced_docs(spark, sf_dir)
    pairs = near_dup_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return _lss_clusters(docs, pairs)


@gate_query(
    "text_ngram_freq",
    oracle="""
    WITH tok AS (
      SELECT doc_id, token, ord
      FROM (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS token,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents
      )
    ),
    bigrams AS (
      SELECT doc_id,
             token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY ord) AS bigram
      FROM tok
    )
    SELECT bigram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM bigrams
    WHERE bigram IS NOT NULL
    GROUP BY bigram
    HAVING COUNT(*) >= 3
    """,
    tags=("text",),
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (n-gram LM / n-gram-Jaccard building
    block). Spark builds bigrams inside one higher-order ``transform``
    over the token array — no per-token explode before the pair is
    formed, no window; the only shuffle is the final count. The oracle
    reconstructs identical pairs via unnest + lead() per document.

    doc frequency = size(collect_set), not countDistinct, for the same
    measured reason as text_tokenize_counts (r5 quiet-window
    interleaved min-of-9 at sf0.1: 0.210 s vs 0.274 s, identical
    output — the Expand doubling every exploded bigram through the
    shuffle is gone). Scale boundary is even safer here than for
    single tokens: per-bigram document sets are far smaller than
    per-token ones (bigram df ≪ token df), so the one-buffer-per-key
    concentration limit sits correspondingly further out."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    # sequence(1, 0) would count DOWN for 1-token docs — guard to empty.
    bigrams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i])) "
        "ELSE array() END"
    )
    return (
        fan_out(d).select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.size(F.collect_set("doc_id")).cast("long").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 3)
    )


@gate_query(
    "text_pack_sequences",
    oracle="""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / 2048.0) AS BIGINT) AS seq_id
      FROM sized
    )
    SELECT seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM placed
    GROUP BY seq_id
    """,
    tags=("text",),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential sequence packing for training-data prep: docs in
    doc_id order are placed into ~2048-token bins by exclusive running
    token count (a doc opens a new bin when the budget is crossed —
    deterministic, unlike greedy best-fit). The single-partition window
    is the honest cost of a GLOBAL packing order; at 100 TB you pack
    per range-partitioned shard instead (seq_id = shard_id * 2^40 +
    local bin), which this op's per-bin accounting makes verifiable."""
    d = table(spark, sf_dir, "documents")
    sized = d.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    placed = sized.withColumn(
        "seq_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0).cast("long"),
    )
    return placed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@gate_query(
    "text_winnowing_fingerprints",
    oracle="""
    WITH pos AS (
      SELECT doc_id, n_chars, text,
             unnest(range(1, GREATEST(n_chars - 8 + 1, 0) + 1)) AS i
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, i, n_chars - 8 + 1 AS n_pos,
             ('0x' || substring(md5(substring(text, i, 8)), 1, 8))::BIGINT AS h
      FROM pos
    ),
    winnowed AS (
      SELECT doc_id, i, n_pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
      FROM hashed
    )
    SELECT doc_id,
           COUNT(DISTINCT m) AS n_fingerprints,
           CAST(SUM(DISTINCT m) AS BIGINT) AS fp_digest
    FROM winnowed
    WHERE i <= n_pos - 4 + 1
    GROUP BY doc_id
    """,
    tags=("text", "dedup", "sketch"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every 8-char k-gram, keep the minimum of each 4-hash sliding
    window — guaranteeing any sufficiently long match between two docs
    shares a fingerprint, at ~2/(w+1) the storage of all k-grams. The
    md5-derived hash plays the rolling hash (same selection, engine-
    portable). Per-doc work is linear and partition-local: one explode,
    one bounded per-doc window, one aggregate — no cross-doc shuffle
    until the final per-doc rollup. Docs shorter than k+w-1 chars have
    no full window and produce no fingerprints (classic winnowing)."""
    d = table(spark, sf_dir, "documents")
    n_pos = F.col("n_chars") - 8 + 1
    pos = d.select(
        "doc_id",
        "text",
        n_pos.alias("n_pos"),
        F.explode(
            F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
                F.expr("array()")
            )
        ).alias("i"),
    )
    hashed = pos.select(
        "doc_id",
        "n_pos",
        "i",
        F.conv(F.substring(F.md5(F.expr("substring(text, i, 8)")), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    winnowed = hashed.withColumn("m", F.min("h").over(w))
    return (
        winnowed.filter(F.col("i") <= F.col("n_pos") - 4 + 1)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("m").alias("n_fingerprints"),
            F.sum_distinct(F.col("m")).cast("long").alias("fp_digest"),
        )
    )


@gate_query(
    "text_curation_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_words
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 100
        AND n_chars * 1.0 / len(string_split(text, ' ')) BETWEEN 3 AND 10
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(lower(text))
                                     ORDER BY doc_id) AS rk
        FROM quality
      ) WHERE rk = 1
    ),
    final AS (SELECT * FROM deduped WHERE lang = 'en')
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_words AS BIGINT)) AS BIGINT) AS total_tokens,
           {DAVG("n_chars", "avg_chars")}
    FROM final
    GROUP BY source
    """,
    tags=("text", "dedup"),
)
def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical curation pipeline, composed end to end: quality
    band filter → exact near-identical dedup (content-hash keeper,
    min doc_id) → language filter → per-source corpus accounting.
    Each stage is one of this engine's standalone operators; the gate
    proves they compose without re-materialization — a single lazy
    plan with two shuffles (dedup hash, final rollup). This is the
    shape a 100 TB pretraining-corpus build runs nightly."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    quality = d.withColumn("n_words", n_words.cast("long")).filter(
        n_words.between(20, 100) & (F.col("n_chars") / n_words).between(3, 10)
    )
    w = Window.partitionBy(F.md5(F.lower(F.col("text")))).orderBy("doc_id")
    deduped = quality.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    final = deduped.filter(F.col("lang") == "en")
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        davg("n_chars", "avg_chars"),
    )


@gate_query(
    "text_weighted_mix",
    oracle=f"""
    WITH rated AS (
      SELECT lang, n_chars,
             CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 500
                       WHEN 'fr' THEN 300 ELSE 100 END AS rate_permille,
             ('0x' || substring(md5(doc_id || ''), 1, 8))::BIGINT % 1000 AS slot
      FROM documents
    )
    SELECT lang,
           CAST(MAX(rate_permille) AS BIGINT) AS rate_permille,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (slot < rate_permille) AS BIGINT) AS n_kept,
           {DSUM("CASE WHEN slot < rate_permille THEN n_chars ELSE 0 END", "kept_chars")}
    FROM rated
    GROUP BY lang
    """,
    tags=("text", "curation", "sample"),
)
def text_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: per-language keep rates (en 80% / de 50% /
    fr 30% / rest 10%) applied as a DETERMINISTIC hash sample — the
    corpus-reweighting step of a pretraining data pipeline. Same
    md5-slot machinery as sample_hash_deterministic, but with a
    per-stratum threshold, which is what `sampleBy` does with an RNG —
    the hash form is reproducible across engines/runs/repartitioning
    and keeps a document's fate stable as rates change smoothly.
    Pure scan-side projection + one groupBy; no shuffle before the
    aggregate; at 100 TB the filter runs at scan speed."""
    d = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 800)
        .when(F.col("lang") == "de", 500)
        .when(F.col("lang") == "fr", 300)
        .otherwise(100)
    )
    slot = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 1000
    )
    rated = d.select(
        "lang",
        "n_chars",
        rate.alias("rate_permille"),
        slot.alias("slot"),
    )
    return rated.groupBy("lang").agg(
        F.max("rate_permille").cast("long").alias("rate_permille"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("slot") < F.col("rate_permille"), 1).otherwise(0)).alias("n_kept"),
        dsum(
            F.when(F.col("slot") < F.col("rate_permille"), F.col("n_chars")).otherwise(0),
            "kept_chars",
        ),
    )


@gate_query(
    "text_pii_scrub",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or call 555-0'
                  || (doc_id % 1000) || ' now' AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
             '\\d{3}-\\d{1,6}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(string_split_regex(raw, '[a-z0-9._]+@[a-z0-9.-]+')) - 1 AS BIGINT)
             AS n_emails,
           CAST(len(string_split_regex(raw, '\\d{3}-\\d{1,6}')) - 1 AS BIGINT) AS n_phones
    FROM synth
    """,
    tags=("text", "curation"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regex-scrub emails and phone numbers, reporting
    per-document redaction counts — the mandatory scrub pass of a
    training-data pipeline. The fixture corpus is synthetic lowercase
    words (no real PII), so the gate first APPENDS deterministic
    pseudo-PII derived from doc_id (identically in both engines),
    then proves the scrub machinery: chained regexp_replace (all
    occurrences) + match counts via split-length (the one regex-count
    primitive both dialects share). Pure projection — zero shuffle,
    scan-speed at any scale; swap the patterns for a real PII pack in
    production."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-0"),
        (F.col("doc_id") % 1000).cast("string"),
        F.lit(" now"),
    )
    email_pat = "[a-z0-9._]+@[a-z0-9.-]+"
    phone_pat = r"\d{3}-\d{1,6}"
    synth = d.select("doc_id", raw.alias("raw"))
    return synth.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
        ).alias("scrubbed"),
        (F.size(F.split(F.col("raw"), email_pat)) - 1).cast("long").alias("n_emails"),
        (F.size(F.split(F.col("raw"), phone_pat)) - 1).cast("long").alias("n_phones"),
    )


@gate_query(
    "text_pack_sequences_sharded",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             CAST(doc_id % 16 AS BIGINT) AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT shard, doc_id, n_tokens,
             shard * 1099511627776 +
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / 2048.0) AS BIGINT) AS seq_id
      FROM sized
    )
    SELECT seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM placed
    GROUP BY seq_id
    """,
    tags=("text", "curation"),
)
def text_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded sequence packing — the scale-path twin of
    text_pack_sequences. The global variant's single-partition window
    is the honest cost of a total packing order; THIS is the recipe its
    docstring prescribes for 100 TB, made a verifiable gate: docs are
    deterministically sharded (doc_id % 16), each shard packs
    independently under its own running-token window (16-way — at
    scale, thousands-way — parallel), and bin ids are namespaced
    shard * 2^40 + local_bin so shards can never collide. Packing
    quality is unchanged (≤ one underfull bin per shard); the window
    is partitioned, so no stage sees more than one shard's rows."""
    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        (F.col("doc_id") % 16).cast("long").alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.withColumn(
        "seq_id",
        F.col("shard") * F.lit(1099511627776).cast("long")
        + F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048.0).cast("long"),
    )
    return placed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# r4 curation additions: repetition quality stats, benchmark
# decontamination, stratified split
# ---------------------------------------------------------------------------

@gate_query(
    "text_repetition_stats",
    oracle="""
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS w,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents
      ) WHERE w <> ''
    ),
    wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
    ),
    per_word AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_word_n
      FROM wc GROUP BY doc_id
    ),
    bigr AS (
      SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
      FROM words
    ),
    bc AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bigr WHERE bg IS NOT NULL
      GROUP BY doc_id, bg
    ),
    per_bigram AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS top_bigram_n
      FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_words, w.n_distinct, w.top_word_n,
           b.top_bigram_n,
           floor(w.top_word_n * 1e6 / w.n_words + 0.5) / 1e6 AS rep_word_ratio,
           floor(b.top_bigram_n * 1e6 / b.n_bigrams + 0.5) / 1e6 AS rep_bigram_ratio
    FROM per_word w JOIN per_bigram b ON w.doc_id = b.doc_id
    """,
    tags=("text", "quality"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rule
    family): per document, the fraction of tokens taken by the most
    frequent word and the fraction of bigrams taken by the most
    frequent bigram — high values mark boilerplate/spam for the
    curation filter. Only the top COUNT is emitted (not which token):
    the max count is unique per doc regardless of which token holds
    it, so the output is deterministic across engines with no
    tie-break contract on the token itself. Ratios use the mode-free
    floor(x*1e6+0.5)/1e6 form (registry rule). Shape: explode →
    (doc, term) partial-count → per-doc max/sum — two shuffles keyed
    by doc-sized groups, no windows over raw tokens, embarrassingly
    parallel at 100 TB."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    base = d.select("doc_id", F.filter(toks, lambda t: t != "").alias("toks"))
    words = base.select("doc_id", F.explode("toks").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_word = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_word_n"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    bc = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    per_bigram = bc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.max("c").cast("long").alias("top_bigram_n"),
    )
    return per_word.join(per_bigram, "doc_id").select(
        "doc_id",
        "n_words",
        "n_distinct",
        "top_word_n",
        "top_bigram_n",
        (F.floor(F.col("top_word_n") * 1e6 / F.col("n_words") + 0.5) / 1e6).alias(
            "rep_word_ratio"
        ),
        (F.floor(F.col("top_bigram_n") * 1e6 / F.col("n_bigrams") + 0.5) / 1e6).alias(
            "rep_bigram_ratio"
        ),
    )


@gate_query(
    "text_decontaminate",
    oracle="""
    WITH words AS (
      SELECT doc_id, w, ord FROM (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS w,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents
      ) WHERE w <> ''
    ),
    sh AS (
      SELECT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
             lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
             lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
             lead(w, 7) OVER win AS shingle
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
    ),
    shingles AS (
      SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL
    ),
    probe AS (
      SELECT doc_id AS probe_id, shingle FROM shingles WHERE doc_id % 50 = 0
    ),
    hits AS (
      SELECT s.doc_id, s.shingle, p.probe_id
      FROM shingles s JOIN probe p USING (shingle)
      WHERE s.doc_id % 50 <> 0
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_shared_shingles,
           CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probe_docs
    FROM hits GROUP BY doc_id
    """,
    tags=("text", "dedup", "contamination"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    8-gram word shingle with a held-out probe set (here the
    deterministic pseudo-eval slice doc_id % 50 == 0 — in production,
    the benchmark suite). This is the standard n-gram contamination
    check (GPT-3 appendix C / The Pile): shingle both sides, inner
    equi-join on the shingle's inverted index, count distinct shared
    shingles and probe docs per corpus doc. NEVER all-pairs: the
    shingle join only touches colliding postings, the same structural
    win as text_near_dedup_jaccard. At 100 TB the probe side is tiny
    (a benchmark suite) → broadcast; here both sides derive from the
    corpus, so the join hash-partitions by shingle."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    grams = F.when(
        F.size("toks") >= 8,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 7),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("toks", i + k) for k in range(8)],
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # repartition: the single-file fixture reads as ONE split, and the
    # 8-gram explode is the heavy stage; checkpoint ONCE because both
    # join sides consume this plan (r6 review — un-materialized, the
    # tokenize+explode executed twice, single-threaded).
    shingles = (
        d.repartition(32, "doc_id")
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(grams).alias("shingle"))
        .localCheckpoint()
    )
    probe = shingles.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("probe_id"), "shingle"
    )
    corpus = shingles.filter(F.col("doc_id") % 50 != 0)
    return (
        corpus.join(probe, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").cast("long").alias("n_shared_shingles"),
            F.countDistinct("probe_id").cast("long").alias("n_probe_docs"),
        )
    )


@gate_query(
    "text_stratified_split",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rn <= ceil(n_lang * 0.9) THEN 'train' ELSE 'val' END AS split
    FROM ordered
    """,
    tags=("text", "sampling"),
)
def text_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val split with exact per-language 90/10
    quotas: order each language's docs by a deterministic hash
    (md5 of the id string — hex-identical across engines, re-run
    stable, uncorrelated with any data column) and cut at the quota.
    Unlike bernoulli hash sampling (text_weighted_mix), the quota is
    EXACT per stratum — ceil(0.9·n) docs land in train, always.
    Scale note: one window per language partition; languages are few
    → for very large strata swap in the sharded-window pattern
    (text_pack_sequences_sharded) or sort-within-lang via
    repartitionByRange on (lang, hash)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_lang"),
    ).select(
        "doc_id",
        "lang",
        F.when(
            F.col("rn") <= F.ceil(F.col("n_lang") * 0.9), F.lit("train")
        ).otherwise(F.lit("val")).alias("split"),
    )


@gate_query(
    "text_chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents
    ),
    sized AS (
      SELECT doc_id, w, len(w) AS n_tokens FROM toks WHERE len(w) > 0
    ),
    chunks AS (
      SELECT doc_id, w, n_tokens,
             unnest(range(0, n_tokens, 48)) AS start
      FROM sized
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(start // 48 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_tok,
           CAST(least(64, n_tokens - start) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(w, start + 1, start + 64), ' ')
             AS chunk_text
    FROM chunks
    """,
    tags=("text", "curation"),
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — split every document into token
    windows of 64 with stride 48 (16-token overlap), the step that
    turns a raw corpus into training sequences for a fixed context
    length. Start offsets come from sequence(0, n-1, 48) exploded
    per doc (Spark) / range(0, n, 48) (DuckDB) — identical start
    sets for n >= 1; the final short chunk is kept (standard for
    packing-with-overlap; drop-last would just add a filter).
    chunk_idx is derived as start/48 rather than posexplode ordinal
    so neither engine depends on unnest ordering. Pure narrow op:
    tokenize, explode, slice, re-join — zero shuffle, embarrassingly
    parallel, memory bounded by one doc's token array per row. At
    100 TB this runs at scan speed; the only design decision that
    matters is NOT materializing the token array per chunk row
    (slice happens before the array is dropped, so each output row
    carries only its 64-token string)."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    sized = (
        d.select("doc_id", toks.alias("w"))
        .withColumn("n_tokens", F.size("w"))
        .filter(F.col("n_tokens") > 0)
    )
    chunks = sized.select(
        "doc_id",
        "w",
        "n_tokens",
        F.explode(
            F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(48))
        ).alias("start"),
    )
    return chunks.select(
        "doc_id",
        F.floor(F.col("start") / 48).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_tok"),
        F.least(F.lit(64), F.col("n_tokens") - F.col("start"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("w"), F.col("start") + 1, F.lit(64)), " "
        ).alias("chunk_text"),
    )


@gate_query(
    "text_shuffle_shard",
    oracle="""
    WITH hashed AS (
      SELECT doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(h % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY h % 8 ORDER BY h, doc_id
           ) AS BIGINT) AS pos
    FROM hashed
    """,
    tags=("text", "sampling"),
)
def text_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle + sharding: every doc
    gets a reproducible pseudo-random position — shard = md5-slot
    mod 8, pos = rank of the hash within the shard (doc_id breaks
    the rare 32-bit-prefix collisions; same md5-slot machinery as
    sample_hash_deterministic, so sampling, mixing and shuffling all
    agree on a doc's fate). This is the epoch-shuffle a training
    pipeline needs: stable across re-runs and engines (no RNG),
    independent of input order/partitioning, and shard-local so
    readers can stream one shard without seeing the others. Scale:
    one hash-partition exchange on shard + a per-shard sort — with
    shards >= output files (here 8 for the fixture; thousands at
    100 TB) the window never sees more than one shard's rows and the
    sort is the write-side sort you'd pay anyway."""
    d = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashed = d.select("doc_id", h.alias("h"), (h % 8).alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


@gate_query(
    "text_chunk_pack_pipeline",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(doc_id % 16 AS BIGINT) AS shard,
             CAST(start // 48 AS BIGINT) AS chunk_idx,
             least(64, n_tokens - start) AS n_chunk_tokens
      FROM (SELECT doc_id, n_tokens, unnest(range(0, n_tokens, 48)) AS start
            FROM sized WHERE n_tokens > 0)
    ),
    placed AS (
      SELECT shard, doc_id, chunk_idx, n_chunk_tokens,
             shard * 1099511627776 +
             CAST(FLOOR((SUM(n_chunk_tokens) OVER (
                           PARTITION BY shard ORDER BY doc_id, chunk_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_chunk_tokens) / 512.0) AS BIGINT) AS bin_id
      FROM chunks
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM placed
    GROUP BY bin_id
    """,
    tags=("text", "curation"),
)
def text_chunk_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus → training-sequence accounting in ONE lazy
    plan: context-window chunking (64-token windows, stride 48 — the
    text_chunk_documents arithmetic) feeding sharded sequence packing
    (512-token bins per doc_id%16 shard, namespaced bin ids — the
    text_pack_sequences_sharded recipe). The composition is the point:
    Catalyst fuses both steps into scan → explode → one shard-window
    shuffle → hash agg.

    Scale observation this gate pins: bin PLACEMENT needs only each
    chunk's token count — derived from n_tokens alone, so the document
    text is pruned at the scan and chunk payloads never enter the
    shuffle (ReadSchema carries doc_id + text only as far as the
    tokenize projection; the window moves 3 longs per chunk). The
    payload slice-and-write happens chunk-locally afterwards, keyed by
    (doc_id, chunk_idx) — embarrassingly parallel, no second
    shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    sized = d.select("doc_id", F.size(toks).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    chunks = sized.select(
        "doc_id",
        (F.col("doc_id") % 16).cast("long").alias("shard"),
        F.explode(
            F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(48))
        ).alias("start"),
        "n_tokens",
    ).select(
        "doc_id",
        "shard",
        F.floor(F.col("start") / 48).cast("long").alias("chunk_idx"),
        F.least(F.lit(64), F.col("n_tokens") - F.col("start")).alias(
            "n_chunk_tokens"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = chunks.withColumn(
        "bin_id",
        F.col("shard") * F.lit(1099511627776).cast("long")
        + F.floor(
            (F.sum("n_chunk_tokens").over(w) - F.col("n_chunk_tokens")) / 512.0
        ).cast("long"),
    )
    return placed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@gate_query(
    "text_near_dedup_editdist",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, substring(text, 1, 32) AS blk FROM documents
    )
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           CAST(levenshtein(a.text, c.text) AS BIGINT) AS edit_dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.text, c.text) <= 16
    """,
    tags=("text", "dedup"),
)
def text_near_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance near-dup — the sixth dedup modality
    (exact hash, shingle-Jaccard, MinHash-LSH, SimHash, embedding-
    cosine, and now character-level Levenshtein), catching the
    small-insertion/typo duplicates token-set methods miss (the
    fixtures plant pairs at distance 4 that share zero shingle
    advantage). Candidate generation is prefix blocking: docs joined
    on their first 32 characters — an equi-join, NEVER an all-pairs
    nested loop (the Levenshtein DP is O(len^2) per pair; at 100 TB
    the blocked join yields ~0 candidates per doc while the quadratic
    form is impossible). The declared semantics ARE the blocked form
    (both engines compute identical blocks, so the oracle is exact);
    recall is bounded by the block key — an edit inside the first 32
    chars moves a doc to another block, the standard prefix-blocking
    trade documented in record-linkage practice. Exact DP distance
    verifies candidates on both sides; integer output, zero float
    parity risk."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, 32).alias("blk")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"), "blk"
    ).repartition(32, "blk")
    c = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"), "blk")
    return (
        a.join(c, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("edit_dist", F.levenshtein("text_a", "text_b").cast("long"))
        .filter(F.col("edit_dist") <= 16)
        .select("doc_a", "doc_b", "edit_dist")
    )


def _positioned_dup_grams(spark: SparkSession, sf_dir: str):
    """The ONE definition of the positioned-8-gram duplication base,
    shared by the stats and removal gates (same rule as the jaccard
    family's shingles()/near_dup_pairs): any change to the token
    filter, gram width, or the nd>=2 cross-doc threshold lands in both
    gates at once. Returns (base, sized, dup):
      base  = (doc_id, w: array<token>)           — repartitioned
      sized = (doc_id, n_tokens, n_grams)          — counters
      dup   = (doc_id, s)                          — duplicated starts
    A gram is 'duplicated' when it occurs in >= 2 DISTINCT documents
    (within-doc repeats are text_repetition_gopher's signal).

    Positioned grams are built EXPLODE-FIRST (bare integer positions
    explode, then ONE concat_ws per exploded row builds the gram from
    the materialized token array). The obvious alternative —
    posexplode over an ALIASED transform(sequence, i -> concat_ws(8 x
    element_at)) grams column — is a measured ~30x pathology (r10
    panel-2 catch, 27 s vs 0.25 s at sf0.1 for the identical 235k-row
    result, checksum-verified; root cause isolated by .explain +
    excludedRules A/B, 32 s -> 1.5 s): Catalyst's
    InferFiltersFromGenerate clones the generator child into a
    `size(c) > 0 AND isnotnull(c)` Filter, and filter pushdown
    substitutes the alias all the way below the repartition Exchange —
    there `w` doesn't exist yet, so every one of the 16 cloned
    element_at calls inlines (and re-evaluates) the full
    filter(split(lower(text))) tokenization: O(grams x width x tokens)
    string work per row, paid TWICE (size + isnotnull), in an
    interpreted pre-exchange Filter. Exploding bare positions keeps
    the inferred filter trivial (size(sequence)>0) and the expensive
    concat_ws safely ABOVE the Generate."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    base = d.select("doc_id", toks.alias("w")).repartition(32, "doc_id")
    n = F.size("w")
    sized = base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.greatest(n - 7, F.lit(0)).cast("long").alias("n_grams"),
    )
    pos = base.select(
        "doc_id",
        "w",
        F.explode(
            F.when(n >= 8, F.sequence(F.lit(0), n - 8))
            .otherwise(F.array().cast("array<int>"))
        ).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.concat_ws(
            " ", *[F.element_at("w", F.col("s") + k + 1) for k in range(8)]
        ).alias("gram"),
    )
    dup_grams = (
        pos.groupBy("gram")
        .agg(F.size(F.collect_set("doc_id")).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    dup = pos.join(dup_grams, "gram", "left_semi").select("doc_id", "s")
    return base, sized, dup


@gate_query(
    "text_substring_dedup_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS w
      FROM documents
    ),
    sized AS (
      SELECT doc_id, len(w) AS n_tokens, GREATEST(len(w) - 7, 0) AS n_grams, w
      FROM base
    ),
    pos AS (
      SELECT doc_id,
             unnest([array_to_string(w[i+1:i+8], ' ')
                     for i in range(0, GREATEST(len(w) - 7, 0))]) AS gram,
             unnest(range(0, GREATEST(len(w) - 7, 0))) AS s
      FROM base
    ),
    df AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY gram),
    dup AS (SELECT p.doc_id, p.s FROM pos p JOIN df USING (gram) WHERE nd >= 2),
    cov AS (
      SELECT doc_id, s,
             GREATEST(0, s + 8 - GREATEST(s,
               COALESCE(MAX(s + 8) OVER (
                 PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
               AS contrib
      FROM dup
    ),
    stats AS (
      SELECT doc_id, COUNT(*) AS n_dup_grams,
             CAST(SUM(contrib) AS BIGINT) AS n_covered_tokens
      FROM cov GROUP BY doc_id
    )
    SELECT z.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(n_covered_tokens, 0) AS BIGINT) AS n_covered_tokens
    FROM sized z LEFT JOIN stats USING (doc_id)
    """,
    tags=("text", "dedup"),
)
def text_substring_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-level duplication profile — the seventh dedup modality
    (document / Jaccard / MinHash-LSH / SimHash / embedding / edit
    distance / substring): for each document, how many of its 8-token
    windows also occur verbatim in ANOTHER document, and how many
    tokens those duplicated windows cover (exact interval union via a
    running-max window — overlapping spans are not double-counted).
    This is the measurement pass of substring-level training-data
    dedup ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022, arXiv:2107.06499 — public method): the coverage
    ratio n_covered_tokens / n_tokens is the signal that decides
    span-removal vs doc-removal downstream.

    Shape at 100 TB: positioned 8-grams explode ~|tokens| rows, the
    gram inverted index is ONE hash shuffle (same structural win as
    text_near_dedup_jaccard — colliding grams only, never all-pairs),
    the coverage union is a per-doc window over only the DUPLICATED
    positions (sparse), and like the jaccard family a production run
    would cap ultra-hot grams (boilerplate) exactly as
    text_near_dedup_jaccard_capped does with stop-shingles. All-integer
    output, zero float surface. Within-doc repeats deliberately do NOT
    count (cross-doc df >= 2 on distinct doc_ids): self-repetition is
    text_repetition_gopher's signal, corpus duplication is this one's."""
    base, sized, dup = _positioned_dup_grams(spark, sf_dir)
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = dup.select(
        "doc_id",
        F.greatest(
            F.lit(0),
            F.col("s") + 8
            - F.greatest(
                F.col("s"), F.coalesce(F.max(F.col("s") + 8).over(wprev), F.lit(0))
            ),
        ).alias("contrib"),
    )
    stats = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
        F.sum("contrib").cast("long").alias("n_covered_tokens"),
    )
    return (
        sized.select("doc_id", "n_tokens", "n_grams")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_covered_tokens", F.lit(0)).cast("long").alias(
                "n_covered_tokens"
            ),
        )
    )


@gate_query(
    "text_substring_dedup_clean",
    oracle="""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id,
             unnest([array_to_string(w[i+1:i+8], ' ')
                     for i in range(0, GREATEST(len(w) - 7, 0))]) AS gram,
             unnest(range(0, GREATEST(len(w) - 7, 0))) AS s
      FROM base
    ),
    df AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY gram),
    dup AS (
      SELECT doc_id, list_sort(list(s)) AS starts
      FROM (SELECT p.doc_id, p.s FROM pos p JOIN df USING (gram) WHERE nd >= 2)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(list_filter(range(0, len(w)),
             p -> len(list_filter(COALESCE(starts, []),
                      s -> s <= p AND p <= s + 7)) = 0)) AS BIGINT) AS n_kept,
           COALESCE(array_to_string(
             list_transform(
               list_filter(range(0, len(w)),
                 p -> len(list_filter(COALESCE(starts, []),
                          s -> s <= p AND p <= s + 7)) = 0),
               p -> w[CAST(p + 1 AS INT)]), ' '), '') AS cleaned_text
    FROM base b LEFT JOIN dup USING (doc_id)
    """,
    tags=("text", "dedup"),
)
def text_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL pass of substring-level dedup (the execution twin of
    text_substring_dedup_stats): drop every token covered by a
    cross-document duplicated 8-gram window and emit the cleaned
    document. The policy is symmetric-removal (all copies lose the
    span) — deterministic with no keeper election, which is what makes
    the output oracle-checkable; a production keep-one policy is this
    plus a min-doc_id keeper exemption, the same election
    text_exact_dedup already demonstrates. Per-doc work is one array
    expression over (token array × its duplicated starts list) — the
    heavy lifting (which grams are duplicated) is _positioned_dup_grams,
    the SAME shared base (and therefore the same single inverted-index
    shuffle) as the stats gate; the cleaned text never shuffles (built
    in the final projection). String-rendered output (agg_collect
    convention) plus an integer kept-count checksum."""
    base, _, dup = _positioned_dup_grams(spark, sf_dir)
    starts = dup.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("s")).alias("starts")
    )
    joined = base.join(starts, "doc_id", "left").select(
        "doc_id",
        "w",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    # Empty/whitespace-only doc guard (r5 review): sequence(0, -1)
    # DESCENDS in Spark and would drive element_at out of bounds — the
    # same hazard shingles()/text_ngram_freq guard against. Empty docs
    # keep nothing: positions = [] (matching the oracle's range(0, 0)).
    positions = F.when(
        F.size("w") > 0, F.sequence(F.lit(0), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept_pos = F.filter(
        positions,
        lambda p: ~F.exists("starts", lambda s: (s <= p) & (p <= s + 7)),
    )
    return joined.select(
        "doc_id",
        F.size(kept_pos).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(kept_pos, lambda p: F.element_at("w", p + 1)), " "
        ).alias("cleaned_text"),
    )


# Paragraph width in tokens for the paragraph-keyed dedup pass. The
# fixture corpus carries no newline structure (verified: zero docs
# contain chr(10) at any SF), so "paragraph" is a fixed 32-token
# block — the same declared-semantics move as the editdist gate's
# 32-char prefix block: both engines derive identical paragraphs, so
# the oracle is exact, and a production corpus would swap the splitter
# for split(text, '\\n\\n') with the rest of the plan unchanged.
TEXT_PARA_TOKENS = 32


@gate_query(
    "text_substring_dedup_paragraph",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS w
      FROM documents
    ),
    paras AS (
      SELECT doc_id,
             unnest(range(0, CAST((len(w) + {TEXT_PARA_TOKENS - 1})
                                  // {TEXT_PARA_TOKENS} AS INT))) AS para_id,
             unnest([array_to_string(
                 w[i * {TEXT_PARA_TOKENS} + 1 : (i + 1) * {TEXT_PARA_TOKENS}], ' ')
               for i in range(0, CAST((len(w) + {TEXT_PARA_TOKENS - 1})
                                      // {TEXT_PARA_TOKENS} AS INT))]) AS ptext,
             unnest([len(w[i * {TEXT_PARA_TOKENS} + 1 : (i + 1) * {TEXT_PARA_TOKENS}])
               for i in range(0, CAST((len(w) + {TEXT_PARA_TOKENS - 1})
                                      // {TEXT_PARA_TOKENS} AS INT))]) AS plen
      FROM base
    ),
    ranked AS (
      SELECT doc_id, para_id, ptext, plen,
             row_number() OVER (
               PARTITION BY ptext ORDER BY doc_id, para_id) AS rn
      FROM paras
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_paras,
             CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN plen ELSE 0 END), 0)
               AS BIGINT) AS n_kept_tokens,
             COALESCE(array_to_string(
               list(ptext ORDER BY para_id) FILTER (rn = 1), ' '), '')
               AS cleaned_text
      FROM ranked GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(COALESCE(n_paras, 0) AS BIGINT) AS n_paras,
           CAST(COALESCE(n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(COALESCE(n_kept_tokens, 0) AS BIGINT) AS n_kept_tokens,
           COALESCE(cleaned_text, '') AS cleaned_text
    FROM base b LEFT JOIN agg USING (doc_id)
    """,
    tags=("text", "dedup"),
)
def text_substring_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAGRAPH-granularity corpus dedup — the keep-first form
    production corpora actually ship (C4 dropped repeated three-
    sentence spans; RefinedWeb/Falcon drop repeated paragraphs; both
    public methods): split every document into paragraphs, drop each
    paragraph whose exact content already occurred EARLIER in the
    corpus (total order (doc_id, para_id) elects the keeper — a
    deterministic election, unlike symmetric removal), and emit the
    cleaned document. Division of labor within the substring family
    (all three share the explode-first discipline): _positioned_dup_grams'
    stats/clean pair owns SPAN-level (8-gram) symmetric removal — it
    catches partial overlap anywhere in the text; this gate owns
    PARAGRAPH-keyed keep-first dedup — the cheap first pass whose unit
    is the paragraph boundary, catching boilerplate blocks verbatim-
    repeated across documents (31/31/428 paragraphs dropped at
    sf0.001/0.01/0.1 — probed at all three SFs, CLAUDE.md 3b).

    Scale shape: paragraphs explode ~|tokens|/32 rows per doc; the
    ONLY shuffle is the row_number window keyed by paragraph CONTENT
    (the inverted-index move — identical paragraphs colocate; nothing
    all-pairs anywhere), plus the per-doc reassembly groupBy. At
    100 TB the content key would be sha256(ptext) so only 32-byte
    hashes shuffle (mm_dedup_assets' pre-shuffle-hash rule); the
    fixture's ~300-char paragraphs shuffle fine as-is and keeping the
    raw text makes the keeper election directly value-checkable.
    Explode-first: bare para_id indices explode (trivial inferred
    filter), ONE array_join(slice(w)) per exploded row builds the
    paragraph ABOVE the Generate — never a posexplode over an aliased
    expensive array (the InferFiltersFromGenerate clone pathology,
    CLAUDE.md known-perf; pinned globally in plans/snapshot.py)."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    base = d.select("doc_id", toks.alias("w")).repartition(32, "doc_id")
    # Integer paragraph count — (|w| + 31) div 32 — matches the
    # oracle's `//`; empty docs (none in any fixture generation, but
    # the guard is the shingles()/clean-gate convention) explode to
    # zero paragraphs, matching range(0, 0).
    n_paras = F.expr(
        f"(size(w) + {TEXT_PARA_TOKENS - 1}) div {TEXT_PARA_TOKENS}"
    )
    paras = base.select(
        "doc_id",
        "w",
        F.explode(
            F.when(
                F.size("w") > 0,
                F.sequence(F.lit(0).cast("long"), n_paras - 1),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("para_id"),
    ).select(
        "doc_id",
        F.col("para_id").cast("long").alias("para_id"),
        F.array_join(
            F.slice(
                "w",
                (F.col("para_id") * TEXT_PARA_TOKENS + 1).cast("int"),
                TEXT_PARA_TOKENS,
            ),
            " ",
        ).alias("ptext"),
        F.size(
            F.slice(
                "w",
                (F.col("para_id") * TEXT_PARA_TOKENS + 1).cast("int"),
                TEXT_PARA_TOKENS,
            )
        ).cast("long").alias("plen"),
    )
    w_first = Window.partitionBy("ptext").orderBy("doc_id", "para_id")
    ranked = paras.withColumn("rn", F.row_number().over(w_first))
    agg = ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias(
            "n_dropped"
        ),
        F.coalesce(
            F.sum(F.when(F.col("rn") == 1, F.col("plen")).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_kept_tokens"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct("para_id", "ptext"),
                            )
                        )
                    ),
                    lambda s: s["ptext"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("n_kept_tokens", F.lit(0)).cast("long").alias(
                "n_kept_tokens"
            ),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge training — distributed tokenizer-vocabulary learning
# ---------------------------------------------------------------------------

TEXT_BPE_ROUNDS = 4


def _bpe_ctes(rounds: int = TEXT_BPE_ROUNDS) -> list[str]:
    """The shared unrolled BPE-merge CTE chain (w0 → pc/best/w per
    round), generated from the SAME Python round constant as the
    Spark loop (the pagerank convention). Each round recomputes the
    argmax pair IN SQL (the merge rule is data-dependent, so the
    oracle must re-derive it, not receive it), then applies the
    identical literal replace. Every multi-referenced CTE is
    MATERIALIZED (DuckDB inlines CTEs per reference — the
    pagerank_converged lesson). Used by both the train oracle (which
    appends per-round stat CTEs) and the encode oracle (which joins
    the final w{rounds} vocabulary against the corpus)."""
    parts = [
        r"""w0 AS MATERIALIZED (
      SELECT word, ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS word_s,
             CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
    pc{r} AS (
      SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT word, freq, s AS a,
               lead(s) OVER (PARTITION BY word ORDER BY i) AS b
        FROM (
          SELECT word, freq,
                 unnest(string_split(trim(word_s), ' ')) AS s,
                 unnest(range(1, len(string_split(trim(word_s), ' ')) + 1)) AS i
          FROM w{r - 1}
        )
      ) WHERE b IS NOT NULL
      GROUP BY a, b
    ),
    best{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM pc{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT word,
             replace(word_s, ' ' || a || ' ' || b || ' ',
                     ' ' || a || b || ' ') AS word_s,
             freq
      FROM w{r - 1} CROSS JOIN best{r}
    )""")
    return parts


def _bpe_oracle(rounds: int = TEXT_BPE_ROUNDS) -> str:
    """Train-gate oracle: the shared CTE chain + per-round audit CTEs
    (chosen pair, its count, corpus/distinct symbol counts after the
    merge), unioned in round order."""
    parts = _bpe_ctes(rounds)
    for r in range(1, rounds + 1):
        parts.append(f"""
    st{r} AS (
      SELECT CAST({r} AS BIGINT) AS round,
             a AS sym_a, b AS sym_b, cnt AS pair_count,
             (SELECT CAST(SUM(freq * len(string_split(trim(word_s), ' ')))
                     AS BIGINT) FROM w{r}) AS corpus_symbols_after,
             (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM (
                SELECT unnest(string_split(trim(word_s), ' ')) AS s
                FROM w{r})) AS distinct_symbols_after
      FROM best{r}
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM st{r}" for r in range(1, rounds + 1)
    )
    return f"WITH {','.join(parts)}\n    {union}"


def _bpe_train_words(
    docs: DataFrame, rounds: int = TEXT_BPE_ROUNDS
) -> tuple[DataFrame, list[tuple[int, DataFrame, DataFrame]]]:
    """The shared Spark-side merge loop: build the word-frequency
    table (one corpus scan), run ``rounds`` argmax-pair merge rounds.
    Returns the final vocabulary (word, word_s, freq) plus per-round
    (round, best, w) for audit consumers. Loop discipline per
    CLAUDE.md: localCheckpoint the loop-invariant word table once
    before the loop and the mutable state after every merge; the
    1-row argmax is checkpointed because it is consumed twice."""
    w = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn(
            "word_s",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")),
        )
        .localCheckpoint()
    )
    rounds_info: list[tuple[int, DataFrame, DataFrame]] = []
    for r in range(1, rounds + 1):
        pairs = F.expr(
            "CASE WHEN size(syms) >= 2 THEN "
            "transform(sequence(1, size(syms) - 1), "
            "i -> struct(syms[i-1] AS a, syms[i] AS b)) "
            "ELSE array() END"
        )
        pc = (
            w.select(
                "freq", F.split(F.trim("word_s"), " ").alias("syms")
            )
            .select("freq", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = (
            pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()
        )
        w = (
            w.crossJoin(F.broadcast(best))
            .select(
                "word",
                F.replace(
                    F.col("word_s"),
                    F.concat(F.lit(" "), "a", F.lit(" "), "b", F.lit(" ")),
                    F.concat(F.lit(" "), "a", "b", F.lit(" ")),
                ).alias("word_s"),
                "freq",
            )
            .localCheckpoint()
        )
        rounds_info.append((r, best, w))
    return w, rounds_info


@gate_query(
    "text_bpe_merge_train",
    oracle=_bpe_oracle(),
    tags=("text",),
)
def text_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer-vocabulary training: TEXT_BPE_ROUNDS
    merge rounds over the corpus word-frequency table. Each round (a)
    counts adjacent symbol pairs weighted by word frequency (one
    shuffle over the VOCABULARY, not the corpus — the corpus is
    scanned exactly once, before the loop), (b) selects the most
    frequent pair with a (count DESC, pair ASC) total-order tie-break
    as a 1-row DataFrame — never a driver scalar — and (c) applies the
    merge to every word's spaced symbol string via a literal
    `replace`, with the 1-row rule riding the sanctioned broadcast
    cross join. Merge semantics are one non-overlapping left-to-right
    replace pass per round — deterministic and engine-identical
    (verified: Spark and DuckDB both scan the original string and
    resume after each match, so ' a a a a ' merging (a,a) yields
    ' aa a a ' in both); canonical BPE's repeated-rescan of
    boundary-sharing runs is deliberately simplified away and
    documented here. Per-round outputs (chosen pair, its count, total
    and distinct symbol counts after the merge) audit the FULL loop
    state each round — round r's counts are only right if every
    earlier merge was. Loop discipline: the word table is
    localCheckpoint-ed before the loop (loop-invariant corpus scan
    runs once) and after each merge (flat lineage); the 1-row argmax
    is checkpointed too, since it is consumed twice (merge + stats).
    At 100 TB this is the standard distributed-BPE-trainer shape:
    pair counting reduces over the vocab, the learned rule broadcasts
    back — the corpus itself is never re-tokenized during training."""
    docs = table(spark, sf_dir, "documents")
    _, rounds_info = _bpe_train_words(docs)
    stats: list[DataFrame] = []
    for r, best, w in rounds_info:
        corpus_after = w.agg(
            F.sum(
                F.col("freq") * F.size(F.split(F.trim("word_s"), " "))
            )
            .cast("long")
            .alias("corpus_symbols_after")
        )
        distinct_after = (
            w.select(F.explode(F.split(F.trim("word_s"), " ")).alias("s"))
            .agg(
                F.countDistinct("s").cast("long").alias(
                    "distinct_symbols_after"
                )
            )
        )
        stats.append(
            best.select(
                F.lit(r).cast("long").alias("round"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("cnt").alias("pair_count"),
            )
            .crossJoin(F.broadcast(corpus_after))
            .crossJoin(F.broadcast(distinct_after))
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out


def _bpe_encode_oracle(rounds: int = TEXT_BPE_ROUNDS) -> str:
    """Encode-gate oracle: the shared merge-chain CTEs re-derive the
    trained vocabulary, then the corpus joins the final w{rounds}
    table and reduces per doc."""
    parts = _bpe_ctes(rounds)
    parts.append("""
    corpus AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
      WHERE word <> ''
    )""")
    return f"""WITH {','.join(parts)}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(string_split(trim(word_s), ' '))) AS BIGINT)
             AS n_tokens,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_unique_words
    FROM corpus JOIN w{rounds} USING (word)
    GROUP BY doc_id"""


@gate_query(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text",),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the inference half of the tokenizer family
    (text_bpe_merge_train learns the merge table; this gate applies
    it to the corpus). Because a word's segmentation depends only on
    the word, encoding is a VOCABULARY JOIN, not a per-token loop:
    the trained (word → merged symbol string) table broadcasts and
    each document's words look their token count up — the shape real
    tokenizer fleets use (the vocab is bounded — ~100k entries for
    production BPE — while the corpus is not). Output per doc:
    word/token/char counts + unique words, the numbers a training-
    data budget (tokens per shard, compression ratio) is planned
    with. All-integer, so zero float parity surface; the oracle
    re-derives the same vocabulary through the shared unrolled CTE
    chain (_bpe_ctes — same Python constants as the Spark loop) and
    joins it identically, so a single wrong merge in either engine
    flips the hash.

    Scale: training runs over the word-frequency table (corpus
    scanned once); encoding is one corpus scan + one broadcast join +
    one groupBy(doc_id) — no shuffle carries text, only counts."""
    docs = table(spark, sf_dir, "documents")
    vocab, _ = _bpe_train_words(docs)
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    n_tok = F.size(F.split(F.trim("word_s"), " "))
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(n_tok).cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.countDistinct("word").cast("long").alias("n_unique_words"),
        )
    )


@gate_query(
    "text_bigram_lm",
    oracle="""
    WITH tok AS (
      SELECT doc_id, token, ord
      FROM (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS token,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents
      )
    ),
    pairs AS (
      SELECT token AS w1,
             lead(token) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      FROM tok
    ),
    counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs WHERE w2 IS NOT NULL
      GROUP BY w1, w2
    ),
    lm AS (
      SELECT w1, w2, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY w1) AS BIGINT) AS w1_total
      FROM counts
    )
    SELECT w1, w2, cnt, w1_total,
           cnt * 1000000 // w1_total AS prob_micro
    FROM lm
    ORDER BY cnt DESC, w1, w2 LIMIT 50
    """,
    tags=("text",),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language model — the KenLM-shaped table the
    classic corpus-quality filters (CCNet-style perplexity proxies)
    score against: P(w2 | w1) as the bigram count over the TOTAL
    CONTINUATIONS of w1 (self-consistent conditioning — the
    denominator is the same pair table summed per w1, so probabilities
    per w1 always sum to ~1 with only floor losses). Probabilities in
    integer micro-units (BIGINT // BIGINT — identical floors, zero
    float surface). Bigrams form inside the same higher-order
    transform as text_ngram_freq (no pre-pair explode); the per-w1
    denominator is a window SUM over the aggregated PAIR table (|vocab
    pairs| rows, not corpus rows). Top-50 with the (cnt DESC, w1, w2)
    total order.

    Scale: one shuffle to count pairs, one window over the counted
    table keyed by w1 (bounded by vocabulary, not corpus); add-one or
    backoff smoothing are plain column arithmetic on this table."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    pairs = _adj_pair_structs()
    counts = (
        d.select(toks.alias("toks"))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_tot = Window.partitionBy("w1")
    lm = counts.select(
        "w1",
        "w2",
        "cnt",
        F.sum("cnt").over(w_tot).cast("long").alias("w1_total"),
    )
    return (
        lm.select(
            "w1",
            "w2",
            "cnt",
            "w1_total",
            F.expr("cnt * 1000000L DIV w1_total").alias("prob_micro"),
        )
        .orderBy(F.col("cnt").desc(), "w1", "w2")
        .limit(50)
    )


@gate_query(
    "text_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, token, ord
      FROM (
        SELECT doc_id,
               unnest(string_split(lower(text), ' ')) AS token,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
        FROM documents
      )
    ),
    pairs AS (
      SELECT doc_id, token AS w1,
             lead(token) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      FROM tok
    ),
    dp AS MATERIALIZED (
      SELECT doc_id, w1, w2 FROM pairs WHERE w2 IS NOT NULL
    ),
    counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM dp WHERE doc_id % 2 = 0
      GROUP BY w1, w2
    ),
    lm AS (
      SELECT w1, w2,
             cnt * 1000000 //
               CAST(SUM(cnt) OVER (PARTITION BY w1) AS BIGINT) AS prob_micro
      FROM counts
    ),
    j AS (
      SELECT d.doc_id, l.prob_micro
      FROM dp d LEFT JOIN lm l ON d.w1 = l.w1 AND d.w2 = l.w2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(prob_micro) AS BIGINT) AS n_seen,
           CAST(SUM(COALESCE(prob_micro, 0)) AS BIGINT) AS sum_prob_micro,
           CASE WHEN COUNT(prob_micro) > 0
                THEN CAST(SUM(COALESCE(prob_micro, 0)) AS BIGINT)
                       // COUNT(prob_micro)
           END AS mean_seen_prob_micro,
           CAST(COUNT(prob_micro) AS BIGINT) * 1000000 // COUNT(*)
             AS coverage_micro
    FROM j GROUP BY doc_id
    """,
    tags=("text",),
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based document quality scoring — the consumer of the
    text_bigram_lm table and the CCNet-style filter shape: train the
    bigram model on a REFERENCE SPLIT (deterministic doc_id % 2 == 0 —
    RNG-free like every split here), then score EVERY document against
    it, so held-out documents genuinely exercise the out-of-vocabulary
    path (a same-corpus LM would make every bigram 'seen' and the OOV
    branch dead code). Per doc: bigram count, bigrams seen in the LM,
    the exact integer sum of their micro-probabilities, the mean over
    seen bigrams (NULL when nothing matched — no fake zero), and
    LM coverage in micro-units. All-integer end to end (BIGINT sums
    and floor divisions on non-negative values), zero float surface.

    Scale: the LM table is vocabulary-pair-bounded (not corpus-bound);
    the score join is an equi-join on (w1, w2) that AQE broadcasts when
    the model is small and hash-partitions when it is not; per-doc
    aggregation shuffles counts, never text. The bigram construction
    is the same higher-order transform as text_bigram_lm (one corpus
    scan, no pre-pair explode)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    doc_pairs = (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(_adj_pair_structs()).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .localCheckpoint()  # two consumers (LM training + scoring join):
        # un-materialized, the corpus tokenize+explode ran twice
        # (r6 review; the oracle marks its dp CTE MATERIALIZED for the
        # same reason).
    )
    train_counts = (
        doc_pairs.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_tot = Window.partitionBy("w1")
    lm = train_counts.select(
        "w1",
        "w2",
        F.expr(
            "cnt * 1000000L DIV CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT)"
        ).alias("prob_micro"),
    )
    scored = doc_pairs.join(lm, ["w1", "w2"], "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.count("prob_micro").cast("long").alias("n_seen"),
            F.sum(F.coalesce(F.col("prob_micro"), F.lit(0))).cast("long").alias("sum_prob_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_seen",
            "sum_prob_micro",
            F.when(
                F.col("n_seen") > 0, F.expr("sum_prob_micro DIV n_seen")
            ).alias("mean_seen_prob_micro"),
            F.expr("n_seen * 1000000L DIV n_bigrams").alias("coverage_micro"),
        )
    )


# ---------------------------------------------------------------------------
# text_bm25 — BM25 lexical retrieval scoring (r6)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "data", "window")  # fixed query, present at all SFs
_BM25_EXPR = (
    # ONE IEEE expression tree, written once and F.expr'd/inlined into
    # both engines verbatim: constants 2.2 / 1.2 / 0.75 parse to the
    # same doubles, 1 - 0.75 folds exactly to 0.25, avgdl is one
    # BIGINT/BIGINT division, ln is the single transcendental (its
    # 1-ulp cross-engine risk is absorbed by the final ROUND(.,6) —
    # the tfidf precedent).
    "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / "
    "(tf + 1.2 * (1 - 0.75 + 0.75 * dl / (CAST(total_dl AS DOUBLE) / n_docs)))"
)


@gate_query(
    "text_bm25",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM tok WHERE token <> '' GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS total_dl,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE token IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, token
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    term AS (
      SELECT tf.doc_id, tf.token, tf.tf, dl.dl,
             {_BM25_EXPR} AS ts
      FROM tf
      JOIN dfreq USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           CAST(SUM(tf) AS BIGINT) AS matched_tf,
           CAST(MIN(dl) AS BIGINT) AS dl,
           ROUND(list_sum(list(ts ORDER BY token)), 6) AS bm25_d6
    FROM term GROUP BY doc_id
    """,
    tags=("text",),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document scoring (Robertson/Spärck Jones, public; the
    Lucene +1 idf form so scores stay positive) for a fixed 3-term
    query — the LEXICAL half of hybrid retrieval (sim_rrf_fusion is
    the fusion stage; tf-idf is the weighting ancestor already gated).
    k1=1.2, b=0.75. Parity: tf/df/dl/N are exact integers; avgdl is
    ONE BIGINT/BIGINT IEEE division; the per-term score is the single
    shared expression _BM25_EXPR (inlined verbatim into both engines);
    the per-doc sum folds the <=3 term scores IN TOKEN ORDER on both
    sides (sorted-struct fold vs list(ts ORDER BY token) — the
    _ordered_mean rule); display via ROUND(.,6), never ranked on.

    Scale: ONE aggregate over ONE scan of the exploded token stream —
    per-doc length and the per-term tfs come out of the same shuffle
    as conditional sums (|terms| is a query-time constant, so the tf
    columns unstack to term rows after the aggregate, when rows are
    already one-per-doc); df and corpus stats ride broadcasts, and
    scoring is a projection. This is the classic search-index
    batch-scoring shape: no windows, no per-row Python, no second
    corpus scan."""
    d = table(spark, sf_dir, "documents")
    tok = tokens(d)
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint()  # three consumers (tf, df, corpus stats) read
    # this |docs|-row table; without the one-time materialization each
    # would re-run the tokenize+aggregate corpus pass (measured: 3
    # documents scans in the plan) — the text_bpe_encode convention.
    stats = per_doc.agg(
        F.sum("dl").cast("long").alias("total_dl"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    term_structs = F.array(
        *[
            F.struct(F.lit(t).alias("token"), F.col(f"tf_{i}").alias("tf"))
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    tf = (
        per_doc.select("doc_id", "dl", F.explode(term_structs).alias("e"))
        .select("doc_id", "dl", F.col("e.token").alias("token"), F.col("e.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    term = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", "tf", "dl", F.expr(_BM25_EXPR).alias("ts"))
    )
    return term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.sum("tf").cast("long").alias("matched_tf"),
        F.min("dl").cast("long").alias("dl"),
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token", "ts"))),
                    lambda s: s["ts"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("bm25_d6"),
    )


# ---------------------------------------------------------------------------
# text_cdc_chunk_dedup — content-defined chunking dedup (r7; the tenth
# dedup modality: rsync/LBFS/FastCDC-style chunk-level dedup)
# ---------------------------------------------------------------------------

_CDC_MOD = 64          # boundary condition h % 64 == 0 -> ~64-char chunks
_CDC_P3, _CDC_P2, _CDC_P1 = 31 ** 3, 31 ** 2, 31  # 4-gram polynomial


def _cdc_chunks(batches):
    """mapInPandas kernel: text in → (doc_id, chunk md5, chunk length)
    out. Boundary after character position i (1-based, i >= 4) iff the
    4-gram polynomial over CODE POINTS (c[i-3]*31^3 + c[i-2]*31^2 +
    c[i-1]*31 + c[i]) % 64 == 0 — per-position independent, so the SQL
    oracle replays it verbatim with ascii(substring(...)). Code points
    via utf-32 decode (matches DuckDB's per-CHARACTER ascii() even if
    a future fixture goes non-ASCII). Only 32-char hashes + integer
    lengths leave the kernel — chunk text never crosses a shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = {"doc_id": [], "ch": [], "clen": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None:
                # Match the oracle's drop semantics: length(NULL)
                # predicates silently exclude NULL-text docs DuckDB-side,
                # so the Spark side must drop (not crash on len(None))
                # or a NULL-bearing fixture regeneration would abort the
                # job instead of diverging loudly (ADVICE r7).
                continue
            n = len(text)
            if n == 0:
                continue
            c = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            if n >= 4:
                h = (
                    c[:-3] * _CDC_P3 + c[1:-2] * _CDC_P2 + c[2:-1] * _CDC_P1 + c[3:]
                ) % _CDC_MOD
                bounds = [int(k) + 4 for k in np.nonzero(h == 0)[0]]
            else:
                bounds = []
            if not bounds or bounds[-1] != n:
                bounds.append(n)
            s = 0
            for e in bounds:
                chunk = text[s:e]
                rows["doc_id"].append(doc_id)
                rows["ch"].append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
                rows["clen"].append(e - s)
                s = e
        yield pd.DataFrame(rows)


@gate_query(
    "text_cdc_chunk_dedup",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, i
      FROM documents, LATERAL unnest(range(4, length(text) + 1)) t(i)
      WHERE (ascii(substring(text, CAST(i - 3 AS INT), 1)) * {_CDC_P3}
           + ascii(substring(text, CAST(i - 2 AS INT), 1)) * {_CDC_P2}
           + ascii(substring(text, CAST(i - 1 AS INT), 1)) * {_CDC_P1}
           + ascii(substring(text, CAST(i AS INT), 1))) % {_CDC_MOD} = 0
    ),
    bounds AS (
      SELECT DISTINCT doc_id, i FROM (
        SELECT doc_id, CAST(i AS BIGINT) AS i FROM b
        UNION ALL
        SELECT doc_id, CAST(length(text) AS BIGINT)
        FROM documents WHERE length(text) > 0
      )
    ),
    spans AS (
      SELECT doc_id,
             COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
             i AS e
      FROM bounds
    ),
    chunks AS MATERIALIZED (
      SELECT sp.doc_id,
             md5(substring(d.text, CAST(sp.s + 1 AS INT), CAST(sp.e - sp.s AS INT)))
               AS ch,
             sp.e - sp.s AS clen
      FROM spans sp JOIN documents d USING (doc_id)
      WHERE sp.e > sp.s
    ),
    freq AS (
      SELECT ch, COUNT(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY ch
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(c.clen) AS BIGINT) AS total_chunk_chars,
           CAST(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           CAST(SUM(CASE WHEN f.ndocs > 1 THEN c.clen ELSE 0 END) AS BIGINT)
             AS shared_chars
    FROM chunks c JOIN freq f USING (ch)
    GROUP BY c.doc_id
    """,
    tags=("text", "dedup", "udf"),
)
def text_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup (rsync / LBFS / FastCDC family)
    — the tenth dedup modality: boundaries are a deterministic
    function of local content (4-gram polynomial fingerprint hitting
    0 mod {_CDC_MOD}), so shared passages chunk IDENTICALLY in every
    document regardless of where they sit — insert one sentence at
    the front of a copied document and byte-offset chunking
    misaligns every block, while CDC boundaries downstream of the
    edit are unchanged. Per doc: chunk count, chars (must equal
    doc length — a built-in partition-of-the-text consistency
    check), and how many chunks/chars are shared with ANY other
    document. Exact duplicates share every chunk; partial overlaps
    surface as intermediate shared_chars.

    Strong oracle: the boundary predicate is per-position
    independent (a windowed polynomial, the Rabin-fingerprint shape
    without the rolling-update optimization), so DuckDB replays it
    character-by-character and md5-hashes the same spans.

    Scale: chunking is embarrassingly parallel in one Arrow pass;
    only (hash, len) pairs reach the shuffle — the chunk-frequency
    groupBy and hash join carry 32-char digests however large the
    documents, exactly like mm_dedup_assets' payload rule. In a
    production CDC a min/max chunk-size clamp bounds the pathological
    all-boundaries/no-boundaries tails; at ~{_CDC_MOD}-char expected
    chunks the fixture corpus needs no clamp (documented boundary)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = fan_out(d).mapInPandas(_cdc_chunks, "doc_id long, ch string, clen long")
    chunks = chunks.localCheckpoint()  # two consumers: freq + per-doc rollup
    freq = chunks.groupBy("ch").agg(F.countDistinct("doc_id").alias("ndocs"))
    return (
        chunks.join(freq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("clen").cast("long").alias("total_chunk_chars"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, F.col("clen")).otherwise(0))
            .cast("long")
            .alias("shared_chars"),
        )
    )


# ---------------------------------------------------------------------------
# text_split_leakage_audit — eval-contamination audit across a split (r7)
# ---------------------------------------------------------------------------


@gate_query(
    "text_split_leakage_audit",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, lang, text,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM documents
    ),
    s AS (
      SELECT doc_id, text,
             CASE WHEN rn <= ceil(n_lang * 0.9) THEN 'train' ELSE 'val' END
               AS split
      FROM ordered
    ),
    h AS (
      SELECT split, md5(substring(lower(text), 1, 40)) AS ch FROM s
    ),
    g AS (
      SELECT ch,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) FILTER (split = 'train') AS BIGINT) AS n_train_docs,
             CAST(COUNT(*) FILTER (split = 'val') AS BIGINT) AS n_val_docs
      FROM h GROUP BY ch
    )
    SELECT CAST(SUM(n_train_docs) AS BIGINT) AS n_train,
           CAST(SUM(n_val_docs) AS BIGINT) AS n_val,
           CAST(COUNT(*) FILTER (n_docs > 1) AS BIGINT) AS n_dup_groups,
           CAST(COUNT(*) FILTER (n_train_docs > 0 AND n_val_docs > 0)
             AS BIGINT) AS n_leaked_groups,
           CAST(COALESCE(SUM(CASE WHEN n_train_docs > 0 AND n_val_docs > 0
                                  THEN n_docs END), 0) AS BIGINT)
             AS n_leaked_docs
    FROM g
    """,
    tags=("text", "dedup", "sampling"),
)
def text_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-CONTAMINATION audit — the check every train/val split must
    pass before an eval number is trusted: compose the deterministic
    stratified split (text_stratified_split's hash-quota logic,
    inlined from the same expressions) with near-dup groups keyed on
    the 40-char OPENING PREFIX (boilerplate/template sharing — the
    classic leakage vector), and report the groups that SPAN the
    boundary — a doc whose template-mate sits in train inflates its
    val copy's eval. The prefix key is deliberate: the current
    fixtures contain ZERO byte-exact duplicate texts (verified — an
    exact content-hash key would make this audit vacuous), but 20+
    prefix groups genuinely straddle documents, and the hash-ordered
    split is blind to content, so the gate exercises a real non-zero
    leak path: n_leaked_groups > 0 is the expected, detected state.
    The production follow-up is keeper-split assignment (move whole
    groups to one side — a one-line change on the same group table);
    the full near-dup escalation swaps this key for
    text_near_dedup_jaccard's shingle/MinHash candidate machinery. Scale: split is a per-language window over
    hash order, groups shuffle 32-byte digests only."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    s = d.select(
        "doc_id",
        "text",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_lang"),
    ).select(
        "text",
        F.when(
            F.col("rn") <= F.ceil(F.col("n_lang") * 0.9), F.lit("train")
        ).otherwise(F.lit("val")).alias("split"),
    )
    g = (
        s.select("split", F.md5(F.substring(F.lower(F.col("text")), 1, 40)).alias("ch"))
        .groupBy("ch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
                "n_train_docs"
            ),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias(
                "n_val_docs"
            ),
        )
    )
    leaked = (F.col("n_train_docs") > 0) & (F.col("n_val_docs") > 0)
    return g.agg(
        F.sum("n_train_docs").cast("long").alias("n_train"),
        F.sum("n_val_docs").cast("long").alias("n_val"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(leaked, 1).otherwise(0)).cast("long").alias("n_leaked_groups"),
        F.coalesce(F.sum(F.when(leaked, F.col("n_docs"))), F.lit(0))
        .cast("long")
        .alias("n_leaked_docs"),
    )


# ---------------------------------------------------------------------------
# text_dedup_incremental — batch-vs-corpus dedup (r8; the production
# incremental shape: a standing corpus index, only the new batch shuffles)
# ---------------------------------------------------------------------------

_INCR_BATCH_MOD = 5   # batch = doc_id % 5 == 4 — a deterministic 20%
                      # "new arrivals" slice at every scale factor
_INCR_JACCARD_T = 0.5


_INCR_ORACLE = f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    fb AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
           WHERE doc_id % {_INCR_BATCH_MOD} = {_INCR_BATCH_MOD - 1}),
    fc AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
           WHERE doc_id % {_INCR_BATCH_MOD} <> {_INCR_BATCH_MOD - 1}),
    common AS (
      SELECT fb.doc_id AS b_id, fc.doc_id AS c_id, COUNT(*) AS n_common
      FROM fb JOIN fc USING (shingle) GROUP BY 1, 2
    ),
    m AS (
      SELECT b_id, c_id,
             n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) AS j
      FROM common
      JOIN sizes sa ON b_id = sa.doc_id
      JOIN sizes sb ON c_id = sb.doc_id
      WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common)
            >= {_INCR_JACCARD_T}
    ),
    best AS (
      SELECT b_id, c_id, j,
             row_number() OVER (PARTITION BY b_id ORDER BY j DESC, c_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY b_id) AS nm
      FROM m
    )
    SELECT d.doc_id,
           CAST(COALESCE(w.nm, 0) AS BIGINT) AS n_matches,
           w.c_id AS best_match,
           CAST(floor(w.j * 1000000 + 0.5) AS BIGINT) AS best_jaccard_micro,
           w.c_id IS NULL AS is_new
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) w ON d.doc_id = w.b_id
    WHERE d.doc_id % {_INCR_BATCH_MOD} = {_INCR_BATCH_MOD - 1}
    """


@gate_query(
    "text_dedup_incremental",
    oracle=_INCR_ORACLE,
    tags=("text", "dedup"),
)
def text_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the ELEVENTH dedup modality and the shape a
    continuously-growing corpus actually runs: dedup a NEW BATCH of
    documents (a deterministic 20% doc_id slice plays the arrivals)
    against the STANDING CORPUS (the other 80%), never corpus against
    itself. Every full-corpus gate in this family re-shuffles the
    world per run; here the corpus side is a fixed inverted index —
    in production pre-materialized and bucketed by shingle
    (sink_bucketed_join's layout) — and only batch-side shingles
    move. Per batch doc: how many corpus near-dups (shingle-Jaccard
    >= 0.5), the best match (highest raw-double Jaccard, c_id
    tie-break — rank on the raw integer-derived ratio, display
    floor-micro BIGINT per the registry parity rules), and an is_new
    verdict for the docs safe to ingest. Measured non-vacuous match
    paths: 9/4/67 batch docs with matches at sf0.001/0.01/0.1;
    every batch doc emits a row (left join), so is_new=true rows
    coexist with matches at every scale.

    Scale: one one-sided equi-join batch-shingles x corpus-index (no
    self-join, no batch x batch), one (b_id, c_id) aggregation, one
    per-batch-doc window. The stop-shingle cap composes exactly as in
    near_dup_pairs(max_doc_freq=...) — corpus df is a property of the
    standing index, computed once per epoch, broadcast as the stop
    set. 100 TB corpus + 1 TB daily batch = the only shape that
    doesn't re-pay the corpus shuffle daily."""
    docs = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    is_batch = F.col("doc_id") % _INCR_BATCH_MOD == _INCR_BATCH_MOD - 1
    batch = docs.filter(is_batch)
    corpus = docs.filter(~is_batch)
    shb = shingles(batch, 3).select(F.col("doc_id").alias("b_id"), "shingle")
    shc = shingles(corpus, 3).select(F.col("doc_id").alias("c_id"), "shingle")
    sizes_b = shb.groupBy("b_id").agg(F.count(F.lit(1)).alias("n_b"))
    sizes_c = shc.groupBy("c_id").agg(F.count(F.lit(1)).alias("n_c"))
    common = shb.join(shc, "shingle").groupBy("b_id", "c_id").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    jac = F.col("n_common") / (F.col("n_b") + F.col("n_c") - F.col("n_common"))
    m = (
        common.join(sizes_b, "b_id")
        .join(sizes_c, "c_id")
        .withColumn("j", jac)
        .filter(F.col("j") >= _INCR_JACCARD_T)
    )
    w = Window.partitionBy("b_id").orderBy(F.col("j").desc(), F.col("c_id"))
    best = (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn("nm", F.count(F.lit(1)).over(Window.partitionBy("b_id")))
        .filter(F.col("rn") == 1)
        .select("b_id", "c_id", "j", "nm")
    )
    return (
        batch.select("doc_id")
        .join(best, F.col("doc_id") == F.col("b_id"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("nm"), F.lit(0)).cast("long").alias("n_matches"),
            F.col("c_id").alias("best_match"),
            F.floor(F.col("j") * 1000000 + 0.5).cast("long").alias(
                "best_jaccard_micro"
            ),
            F.col("c_id").isNull().alias("is_new"),
        )
    )


# ---------------------------------------------------------------------------
# text_rag_context_pack — retrieval-to-context pipeline (r8): multi-query
# BM25 retrieval feeding a token-budget context pack in ONE lazy plan
# ---------------------------------------------------------------------------

_RAG_N_QUERIES = 5     # query docs: doc_id < 5 (the decontaminate probe shape)
_RAG_QUERY_TERMS = 4   # first 4 distinct tokens of each query doc
_RAG_BUDGET = 192      # context token budget (~3-4 fixture docs, avg dl 55)


@gate_query(
    "text_rag_context_pack",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w
      FROM documents WHERE doc_id >= {_RAG_N_QUERIES}
    ),
    tok AS (
      SELECT doc_id, unnest(w) AS token FROM corpus
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM tok WHERE token <> '' GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS total_dl,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM dl
    ),
    qpos AS (
      SELECT q.doc_id AS query_id, q.w[CAST(i AS INT)] AS token,
             MIN(i) AS first_pos
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents WHERE doc_id < {_RAG_N_QUERIES}) q,
           LATERAL unnest(range(1, len(q.w) + 1)) t(i)
      WHERE q.w[CAST(i AS INT)] <> ''
      GROUP BY 1, 2
    ),
    qterm AS (
      SELECT query_id, token FROM (
        SELECT query_id, token,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY first_pos, token
               ) AS trn
        FROM qpos
      ) WHERE trn <= {_RAG_QUERY_TERMS}
    ),
    tf AS (
      SELECT t.doc_id, t.token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok t
      WHERE t.token <> '' AND t.token IN (SELECT token FROM qterm)
      GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    term AS (
      SELECT q.query_id, tf.doc_id, tf.token,
             {_BM25_EXPR} AS ts
      FROM qterm q
      JOIN tf USING (token)
      JOIN dfreq USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    ),
    scored AS (
      SELECT query_id, doc_id,
             ROUND(list_sum(list(ts ORDER BY token)), 6) AS score_d6
      FROM term GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, score_d6,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score_d6 DESC, doc_id
             ) AS rnk
      FROM scored
    ),
    packed AS (
      SELECT r.query_id, r.rnk, r.doc_id, r.score_d6, dl.dl,
             SUM(dl.dl) OVER (
               PARTITION BY r.query_id ORDER BY r.rnk
               ROWS UNBOUNDED PRECEDING
             ) AS cum_tokens
      FROM ranked r JOIN dl USING (doc_id)
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_d6,
           dl, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM packed
    WHERE cum_tokens <= {_RAG_BUDGET} OR rnk = 1
    """,
    tags=("text", "retrieval"),
)
def text_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG RETRIEVAL PIPELINE in one lazy plan — the read side of
    retrieval-augmented generation: multi-query BM25 retrieval over
    the corpus feeding a per-query token-budget context pack.

    Stages (all one DAG, no intermediate materialization except the
    shared corpus pass): (1) queries = the doc_id < 5 probe slice
    (text_decontaminate's shape), each query being its doc's first
    4 distinct tokens in document order (deterministic, no RNG);
    (2) BM25 scoring of every corpus doc against every query via the
    token inverted index — query terms are a broadcast-sized table,
    so candidate (query, doc) pairs are bounded by term postings,
    never |queries| x |corpus|; per-term scores use the SAME
    _BM25_EXPR string as text_bm25, summed in token order (the
    ordered-fold rule); (3) rank per query on the ROUNDED score
    (ln-tainted key -> rounded-rank is the tfidf/bm25 family
    convention) with doc_id tie-break; (4) pack: running token total
    in rank order, keep the prefix within the 192-token budget —
    cumulative sums only grow, so `cum <= budget` IS prefix
    semantics — with the rank-1 doc always kept (a real RAG stack
    never sends an empty context; it truncates at generation).

    Scale: corpus tf/dl/stats are ONE tokenize pass (localCheckpoint,
    the text_bm25 convention); query terms broadcast; the per-query
    rank and the pack are WindowGroupLimit-shaped windows over
    candidate rows only. Nothing quadratic, nothing per-row Python."""
    d = table(spark, sf_dir, "documents").repartition(32, "doc_id")
    qdocs = d.filter(F.col("doc_id") < _RAG_N_QUERIES)
    corpus = d.filter(F.col("doc_id") >= _RAG_N_QUERIES)

    ctok = tokens(corpus)
    dl = ctok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    ).localCheckpoint()  # consumed by stats, tf-filter join, and the
    # final pack join — one corpus tokenize pass, not three.
    stats = dl.agg(
        F.sum("dl").cast("long").alias("total_dl"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )

    w_arr = F.split(F.lower(F.col("text")), " ")
    qpos = (
        qdocs.select(
            F.col("doc_id").alias("query_id"),
            F.posexplode(w_arr).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
        .groupBy("query_id", "token")
        .agg(F.min("pos").alias("first_pos"))
    )
    w_t = Window.partitionBy("query_id").orderBy("first_pos", "token")
    qterm = (
        qpos.withColumn("trn", F.row_number().over(w_t))
        .filter(F.col("trn") <= _RAG_QUERY_TERMS)
        .select("query_id", "token")
    )

    tf = (
        ctok.join(F.broadcast(qterm.select("token").distinct()), "token")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    term = (
        F.broadcast(qterm)
        .join(tf, "token")
        .join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "token", F.expr(_BM25_EXPR).alias("ts"))
    )
    scored = term.groupBy("query_id", "doc_id").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token", "ts"))),
                    lambda s: s["ts"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("score_d6")
    )
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("score_d6").desc(), F.col("doc_id")
    )
    ranked = scored.withColumn("rnk", F.row_number().over(w_r).cast("long"))
    w_c = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        ranked.join(dl, "doc_id")
        .withColumn("cum_tokens", F.sum("dl").over(w_c).cast("long"))
        .filter((F.col("cum_tokens") <= _RAG_BUDGET) | (F.col("rnk") == 1))
    )
    return packed.select(
        "query_id", "rnk", "doc_id", "score_d6", "dl", "cum_tokens"
    )


# ---------------------------------------------------------------------------
# text_bpe_roundtrip — encode→decode losslessness proof (r8)
# ---------------------------------------------------------------------------


def _bpe_roundtrip_oracle(rounds: int = TEXT_BPE_ROUNDS) -> str:
    """Roundtrip oracle: the shared merge-chain CTEs re-derive the
    vocabulary, each positioned corpus word decodes via
    replace(word_s, ' ', ''), docs reassemble in position order, and
    the md5 of the rebuilt text is compared against the md5 of the
    whitespace-normalized original — the codec-losslessness check in
    closed form (the mm_audio_decode_wav convention)."""
    parts = _bpe_ctes(rounds)
    parts.append("""
    corpus AS (
      SELECT doc_id, i AS pos, w[CAST(i AS INT)] AS word
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents),
           LATERAL unnest(range(1, len(w) + 1)) t(i)
      WHERE w[CAST(i AS INT)] <> ''
    )""")
    return f"""WITH {','.join(parts)},
    dec AS (
      SELECT doc_id, pos,
             replace(word_s, ' ', '') AS dw,
             len(string_split(trim(word_s), ' ')) AS ntok
      FROM corpus JOIN w{rounds} USING (word)
    ),
    per AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(ntok) AS BIGINT) AS n_tokens,
             string_agg(dw, ' ' ORDER BY pos) AS rebuilt
      FROM dec GROUP BY doc_id
    ),
    orig AS (
      SELECT doc_id,
             array_to_string(
               list_filter(string_split(lower(text), ' '), x -> x <> ''),
               ' ') AS norm
      FROM documents
    )
    SELECT p.doc_id, p.n_words, p.n_tokens,
           md5(p.rebuilt) = md5(o.norm) AS roundtrip_ok,
           md5(p.rebuilt) AS rebuilt_md5
    FROM per p JOIN orig o ON p.doc_id = o.doc_id"""


@gate_query(
    "text_bpe_roundtrip",
    oracle=_bpe_roundtrip_oracle(),
    tags=("text",),
)
def text_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ROUNDTRIP — the losslessness proof the tokenizer family
    owed: encode every corpus word through the trained vocabulary,
    DECODE it back (a BPE token string decodes by deleting the symbol
    separators — merges only ever concatenate), reassemble each
    document in word order, and hash-compare against the whitespace-
    normalized original. roundtrip_ok must be TRUE for every doc and
    the rebuilt md5 itself is hash-checked cross-engine, so the claim
    is proven per document, in both engines, against independently
    derived vocabularies (the oracle re-trains via the unrolled
    _bpe_ctes chain sharing the Spark loop's Python constants — the
    codec-closed-form convention from mm_audio_decode_wav).

    Scale: the vocab broadcasts (bounded), the corpus is scanned once
    with positions, reassembly is one groupBy(doc_id) with an ordered
    fold — only word-position structs and 32-char hashes shuffle."""
    docs = table(spark, sf_dir, "documents")
    vocab, _ = _bpe_train_words(docs)
    words = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    dec = words.join(F.broadcast(vocab), "word").select(
        "doc_id",
        "pos",
        F.regexp_replace("word_s", " ", "").alias("dw"),
        F.size(F.split(F.trim("word_s"), " ")).alias("ntok"),
    )
    per = dec.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "dw"))),
                lambda s: s["dw"],
            ),
            " ",
        ).alias("rebuilt"),
    )
    orig = docs.select(
        "doc_id",
        F.array_join(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != ""),
            " ",
        ).alias("norm"),
    )
    return per.join(orig, "doc_id").select(
        "doc_id",
        "n_words",
        "n_tokens",
        (F.md5("rebuilt") == F.md5("norm")).alias("roundtrip_ok"),
        F.md5("rebuilt").alias("rebuilt_md5"),
    )


# ---------------------------------------------------------------------------
# text_quality_budget_mix — token-budgeted quality-first curation (r8)
# ---------------------------------------------------------------------------

_QBM_BUDGET = 2000       # per-language token budget (n_words proxy)
_QBM_IDEAL_AWL = 5.5e6   # ideal avg word length, micro-units


@gate_query(
    "text_quality_budget_mix",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             n_chars
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, lang, n_words,
             CAST(floor(abs(n_chars * 1000000.0 / n_words
                            - {_QBM_IDEAL_AWL})) AS BIGINT) AS quality_micro
      FROM q WHERE n_words > 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY lang ORDER BY quality_micro, doc_id
             ) AS rnk
      FROM keyed
    ),
    packed AS (
      SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_words,
             quality_micro,
             CAST(SUM(n_words) OVER (
               PARTITION BY lang ORDER BY rnk ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM ranked
    )
    SELECT lang, rnk, doc_id, n_words, quality_micro, cum_tokens
    FROM packed
    WHERE cum_tokens <= {_QBM_BUDGET} OR rnk = 1
    """,
    tags=("text", "sampling"),
)
def text_quality_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-FIRST curation under a TOKEN BUDGET — the data-mixing
    step real pretraining recipes run: per language, take the
    highest-quality documents until the language's token budget is
    spent (budgets are how corpus proportions are actually enforced —
    per-language token counts, not doc counts). Quality key = integer
    micro-distance of the doc's average word length from the ideal
    (|n_chars/n_words - 5.5| in micro-units: ONE BIGINT-derived IEEE
    division then floor — an integer rank key, no float-ordering
    surface), tie-break doc_id; the budget cut is the prefix of the
    per-language ranking (cumulative sums only grow), rank-1 always
    kept so no language goes unrepresented. Complements
    text_weighted_mix (hash-rate mixing: random representative,
    ignores quality) — this is the selective form used when the
    budget is scarcer than the supply.

    Scale: one projection for the key, one per-language window rank +
    running sum (WindowGroupLimit-shaped), nothing quadratic, no text
    shuffles beyond the doc rows themselves."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    ).cast("long")
    keyed = d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        "n_chars",
    ).filter(F.col("n_words") > 0).select(
        "doc_id",
        "lang",
        "n_words",
        F.floor(
            F.abs(
                F.col("n_chars") * 1000000.0 / F.col("n_words")
                - F.lit(_QBM_IDEAL_AWL)
            )
        ).cast("long").alias("quality_micro"),
    )
    w_r = Window.partitionBy("lang").orderBy("quality_micro", "doc_id")
    w_c = (
        Window.partitionBy("lang")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        keyed.withColumn("rnk", F.row_number().over(w_r).cast("long"))
        .withColumn("cum_tokens", F.sum("n_words").over(w_c).cast("long"))
        .filter((F.col("cum_tokens") <= _QBM_BUDGET) | (F.col("rnk") == 1))
    )
    return packed.select(
        "lang", "rnk", "doc_id", "n_words", "quality_micro", "cum_tokens"
    )
