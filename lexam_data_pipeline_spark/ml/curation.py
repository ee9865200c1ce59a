"""Corpus-curation operators: deterministic sampling, PII redaction, URL
canonicalization (north star — training-data pipeline surface).

Everything here is pure Catalyst expressions — no Python in the data path,
so at 100 TB these run inside whole-stage codegen over the parquet scan.

Reproducibility is a first-class requirement for corpus curation (a
training mix must be re-creatable bit-for-bit months later), so sampling
is *hash-threshold* based — ``md5(key) < t`` — not ``rand()``-based:

* the same row always makes the same decision, independent of partition
  layout, executor count, task retries, or Spark version;
* the sample is engine-portable (md5 is md5 everywhere), which is what
  lets DuckDB oracle-check every query in this module;
* growing the rate from 10% to 20% *extends* the 10% sample instead of
  resampling it (thresholds nest), so ablation corpora share rows.

Scale notes per operator are on the functions below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.functions.text import word_count

# --------------------------------------------------------------------------
# deterministic sampling
# --------------------------------------------------------------------------


def hash_bucket(key: Column, salt: str = "") -> Column:
    """First 8 hex chars of md5(salt || key) — a uniform 32-bit bucket as
    a lowercase hex string.  Lexicographic order on fixed-width lowercase
    hex IS numeric order, so ``hash_bucket(k) < hex_threshold(r)`` keeps
    an ``r`` fraction of rows deterministically."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def hex_threshold(rate: float) -> str:
    """``rate`` ∈ [0, 1] → 8-char lowercase hex threshold."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def hash_sample(df: DataFrame, key: Column, rate: float, salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below the rate threshold.

    100 TB shape: map-only — a codegen'd filter directly over the scan,
    no shuffle, no driver state, retry-safe (decisions are pure functions
    of the key).  Distinct ``salt`` values give independent samples."""
    return df.where(hash_bucket(key, salt) < hex_threshold(rate))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key: Column,
    k: int,
    prefilter_rate: float | None = None,
) -> DataFrame:
    """Exactly-k-per-group sample: the k smallest ``md5(key)`` values in
    each group (deterministic, engine-portable), tie-broken by key.

    100 TB shape: a bare window partitioned by a low-cardinality group
    (5 languages) would funnel the whole corpus through 5 reducers.  The
    fix exploits that "top-k by ascending md5" and "hash-threshold
    filter" select the SAME rows: a map-only ``hash_sample`` prefilter
    at a generous rate shrinks window input by 1/rate× first, and the
    window then runs over survivors only.  Exact whenever every group
    keeps ≥ k survivors (rate ≫ k / min-group-size); the DuckDB oracle
    computes the UNFILTERED top-k, so the correctness gate itself proves
    the prefilter dropped nothing.  Emits ``sample_rank`` (1-based).
    """
    out = df.withColumn("__bucket", hash_bucket(key))
    if prefilter_rate is not None:
        out = out.where(F.col("__bucket") < hex_threshold(prefilter_rate))
    w = Window.partitionBy(group_col).orderBy(F.col("__bucket"), key)
    return (
        out.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("__bucket")
    )


def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25% deterministic document sample (reproducible corpus subsetting)."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, F.col("doc_id"), 0.25).select("doc_id", "lang", "n_chars")


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 docs per language — language-balanced eval-set carving.  Runs
    with the 0.5 prefilter; the oracle's unfiltered top-k must agree."""
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", F.col("doc_id"), k=10, prefilter_rate=0.5)
    return out.select("doc_id", "lang", "sample_rank")


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

#: Patterns restricted to the RE2 ∩ java.util.regex common dialect (no
#: lookaround, no backrefs) so Spark and the DuckDB oracle agree byte-
#: for-byte.  Order matters: URL first (emails/IPs inside URLs redact as
#: part of the URL), then EMAIL, IP, PHONE.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{2,4}-\d{4,9}", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace over ``PII_PATTERNS`` — one codegen'd
    projection, no UDFs.  100 TB shape: map-only over the scan."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-pattern match counts (pre-redaction audit columns)."""
    return [
        F.regexp_count(col, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]


def _with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Append deterministic PII-bearing suffixes to the fixture corpus
    (the synthetic documents contain no organic PII).  Both engines
    build the identical augmented text, so the redactor is exercised on
    known-positive content while staying oracle-checkable."""
    email = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit("@"), F.col("source"), F.lit(".example.com")
    )
    ip = F.concat(
        F.lit("10."), (F.col("doc_id") % 256).cast("string"), F.lit(".0."), (F.col("doc_id") % 250 + 1).cast("string")
    )
    phone = F.concat(F.lit("+41-79-"), F.lpad((F.col("doc_id") % 9999999).cast("string"), 7, "0"))
    return docs.withColumn(
        "aug_text",
        F.concat(F.col("text"), F.lit(" contact "), email, F.lit(" at "), ip, F.lit(" or "), phone),
    )


def q_pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII audit: documents scanned, matches per pattern,
    and net character delta after redaction.  The redaction itself is the
    map-only ``redact_pii`` projection; the rollup is one partial-agg
    groupBy on 5 keys."""
    docs = _with_synthetic_pii(load_table(spark, sf_dir, "documents"))
    aug = F.col("aug_text")
    return (
        docs.select("lang", *pii_counts(aug), (F.length(aug) - F.length(redact_pii(aug))).alias("delta"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *[F.sum(f"n_{name}").cast("bigint").alias(f"total_{name}") for name, _, _ in PII_PATTERNS],
            F.sum("delta").cast("bigint").alias("chars_removed"),
        )
    )


# --------------------------------------------------------------------------
# URL canonicalization + dedup
# --------------------------------------------------------------------------

#: Host inside an absolute http(s) URL: skips scheme and a leading
#: ``www.``, stops at port / path / query / fragment.  Non-capturing
#: groups only — supported identically by java.util.regex and RE2.
_HOST_RE = r"^https?://(?:www\.)?([^/:?#]+)"
#: Path component (absent → empty string).
_PATH_RE = r"^https?://[^/?#]*(/[^?#]*)"


def extract_domain(url: Column) -> Column:
    """Lowercased registrable-host extraction (port and ``www.`` dropped)."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def normalize_url(url: Column) -> Column:
    """Canonical form ``host/path``: lowercase; scheme, ``www.``, port,
    query string, fragment, and trailing slash dropped.  Built from two
    ``regexp_extract``s rather than replacement backrefs ($1 vs \\1 —
    the one regexp feature whose syntax DIVERGES between engines)."""
    lowered = F.lower(url)
    path = F.regexp_replace(F.regexp_extract(lowered, _PATH_RE, 1), r"/$", "")
    return F.concat(extract_domain(url), path)


def _with_synthetic_urls(docs: DataFrame) -> DataFrame:
    """Deterministic messy URLs over the fixture corpus: scheme, ``www.``
    prefix, port, and tracking query string all vary by doc_id residue,
    and the path collides on ``doc_id % 97`` — so normalization performs
    real merges with a known answer."""
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example.com"),
        F.when(d % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (d % 97).cast("string"),
        F.when(d % 4 == 0, F.lit("?utm_source=feed#frag")).otherwise(F.lit("")),
    )
    return docs.withColumn("url", url)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: normalize, then keep one canonical doc per
    normalized URL (min doc_id) with the duplicate count — the standard
    crawl-dedup pre-pass that runs *before* content hashing.

    100 TB shape: one partial-agg groupBy on the normalized key; the
    normalize itself is map-only codegen.  Skewed hot URLs are bounded by
    map-side combine (each mapper emits one row per distinct key)."""
    docs = _with_synthetic_urls(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(normalize_url(F.col("url")).alias("norm_url"), "doc_id")
        .groupBy("norm_url")
        .agg(F.min("doc_id").alias("canonical_doc"), F.count("*").alias("n_dups"))
    )


# --------------------------------------------------------------------------
# end-to-end cleaning pipeline
# --------------------------------------------------------------------------


def dedup_exact_keep_first(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Exact content dedup, lowest-id survivor: ONE window over
    ``md5(text)`` — the shuffle carries a 16-byte hash + key, never the
    document body.  Shared by curate_corpus and the declarative pipeline
    compiler (pipeline/declarative.py)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 25,
    max_words: int = 80,
    sample_rate: float | None = None,
) -> DataFrame:
    """C4-style cleaning pass as ONE declarative plan: quality gate →
    exact dedup (keep lowest id per content hash) → deterministic sample.

    Stage order is the 100 TB cost order:

    1. the word-count gate is a map-only codegen filter directly over the
       scan, so the expensive stages only see survivors;
    2. dedup shuffles a 16-byte md5 + key — never the document body —
       and keeps the first-id row per hash via one window;
    3. the sample is the map-only ``hash_sample`` filter (re-runnable,
       nested thresholds — see module docstring).

    One shuffle total.  Emits ``doc_id``, ``lang``, ``n_words``.
    """
    gated = docs.withColumn("n_words", word_count(F.col(text_col)).cast("int")).where(
        F.col("n_words").between(min_words, max_words)
    )
    deduped = dedup_exact_keep_first(gated, text_col, id_col)
    if sample_rate is not None:
        deduped = hash_sample(deduped, F.col(id_col), sample_rate)
    return deduped.select(id_col, "lang", "n_words")


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cleaning pipeline at gate 25–80 words + 50% sample."""
    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus(docs, min_words=25, max_words=80, sample_rate=0.5)


# --------------------------------------------------------------------------
# corpus mixing
# --------------------------------------------------------------------------


def mix_to_budget(
    docs: DataFrame,
    source_col: str,
    tokens: Column,
    key: Column,
    budget_per_source: int | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Downsample each source to a per-source token budget (training-mix
    rebalancing).  Default budget: the smallest source's token total —
    "balance every source down to the smallest".

    The per-source keep rate ``min(1, budget / source_total)`` is
    computed INSIDE the plan — a per-source aggregate broadcast-joined
    back onto the corpus — so there is no driver collect and the whole
    mix is one declarative query.  The sample itself is the module's
    deterministic md5-threshold filter: the rate becomes an 8-hex-char
    threshold via ``format_string('%08x', floor(rate · 2³²))`` (clamped
    to ``ffffffff`` so rate 1.0 keeps everything), and a row survives if
    its hash bucket is ``<=`` the threshold.

    100 TB shape: one partial-agg pass for the totals (20 rows out), a
    broadcast join, and a map-only filter — the corpus body shuffles
    zero times.  Token counts are *expected* to land within
    O(max-doc-tokens · √n) of the budget; exact-budget packing is a
    different (order-sensitive) operator.
    """
    totals = docs.groupBy(source_col).agg(F.sum(tokens).alias("__total"))
    if budget_per_source is None:
        totals = totals.crossJoin(
            F.broadcast(totals.agg(F.min("__total").alias("__budget")))
        )
    else:
        totals = totals.withColumn("__budget", F.lit(budget_per_source))
    rate = F.least(F.col("__budget") / F.col("__total"), F.lit(1.0))
    thresholds = totals.select(
        source_col,
        F.format_string(
            "%08x",
            F.least(F.floor(rate * F.lit(float(2**32))), F.lit(2**32 - 1)).cast("bigint"),
        ).alias("__thresh"),
    )
    return (
        docs.join(F.broadcast(thresholds), source_col)
        .where(hash_bucket(key, salt) <= F.col("__thresh"))
        .drop("__thresh")
    )


def q_mix_sources_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance all 20 document sources to the smallest source's token
    total; report the post-mix per-source doc and token counts."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", word_count(F.col("text")).cast("int")
    )
    mixed = mix_to_budget(docs, "source", F.col("n_tok"), F.col("doc_id"))
    return mixed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
    )


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    order_col: str,
    tokens_col: str,
    seq_len: int,
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign each document to the fixed-length training sequence in
    which it STARTS under greedy concatenation in ``order_col`` order —
    the standard "concat the corpus, chunk every ``seq_len`` tokens"
    pretraining layout.  Adds ``tok_start`` (global token offset) and
    ``seq_id`` (= ``tok_start div seq_len``).

    The global running sum is a TWO-LEVEL prefix sum, never a
    single-partition window: per-bucket token totals (one partial-agg
    pass, ``n/bucket_width`` rows out) get a cumulative window on the
    tiny bucket spine, broadcast back as offsets, and the wide data only
    ever does a per-bucket window — so the corpus shuffles once by
    bucket and no executor sorts more than a bucket.  ``order_col`` must
    be a non-negative integer id; bucket = ``id div bucket_width``.
    """
    bucket = (F.col(order_col) / bucket_width).cast("bigint").alias("__bucket")
    d = docs.withColumn("__bucket", bucket)
    spine = d.groupBy("__bucket").agg(F.sum(tokens_col).alias("__btok"))
    w_spine = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = spine.withColumn(
        "__offset", (F.sum("__btok").over(w_spine) - F.col("__btok")).cast("bigint")
    ).drop("__btok")
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "tok_start",
            (
                F.col("__offset")
                + F.sum(tokens_col).over(w_in)
                - F.col(tokens_col)
            ).cast("bigint"),
        )
        .withColumn("seq_id", (F.col("tok_start") / seq_len).cast("bigint"))
        .drop("__bucket", "__offset")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the corpus into 512-token sequences in doc_id order; report
    per-sequence document count, token mass, and the doc-id span."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", word_count(F.col("text")).cast("int")
    )
    packed = pack_sequences(docs, "doc_id", "n_tok", seq_len=512, bucket_width=64)
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# temperature-weighted source mixing
# --------------------------------------------------------------------------


def temperature_mix(
    docs: DataFrame,
    source_col: str,
    key: Column,
    tokens_col: str,
    alpha: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-flattened source sampling (the GPT-3 / LLaMA mixture
    move: sample source *s* proportional to ``T_s**alpha`` instead of its
    raw token mass ``T_s``, ``alpha < 1`` boosting small sources).

    Downsampling-only formulation: the smallest source keeps everything
    and source *s* keeps the fraction ``(T_min / T_s) ** (1 - alpha)``,
    which makes kept-token mass proportional to ``T_s ** alpha``.  The
    keep decision is the engine-portable deterministic hash threshold
    (see module docstring) with the per-source threshold computed IN the
    plan from a tiny per-source aggregate — no driver round-trip, so the
    whole mix is one job.

    ``alpha`` must satisfy ``1 - alpha ∈ {0.5, 1}`` for bit-exact
    cross-engine thresholds (sqrt and division are correctly rounded
    IEEE ops everywhere; a general ``pow`` is not) — the operator
    rejects other values rather than silently losing oracle parity.

    100 TB shape: the totals aggregate is partial-agg'd to ``O(sources)``
    rows, the min spans those few rows, the rates broadcast-join back
    onto the corpus, and the filter itself is map-side codegen.
    """
    if abs(alpha - 0.5) > 1e-12 and abs(alpha) > 1e-12:
        raise ValueError(f"alpha must be 0.5 or 0 for engine-exact rates, got {alpha}")
    totals = docs.groupBy(source_col).agg(
        F.sum(F.col(tokens_col)).cast("double").alias("__t")
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ratio = F.min("__t").over(w_all) / F.col("__t")
    rate = F.sqrt(ratio) if alpha == 0.5 else ratio
    rates = totals.select(
        source_col,
        F.lpad(
            F.lower(
                F.hex(
                    F.least(
                        F.floor(rate * F.lit(float(16**8))).cast("bigint"),
                        F.lit(16**8 - 1),
                    )
                )
            ),
            8,
            "0",
        ).alias("__thresh"),
    )
    return (
        docs.join(F.broadcast(rates), source_col)
        .where(hash_bucket(key, salt) < F.col("__thresh"))
        .drop("__thresh")
    )


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha=0.5 temperature mix over the fixture's skewed sources;
    reports per-source kept docs + tokens (small sources survive whole,
    big ones flatten toward sqrt of their share)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", word_count(F.col("text")).cast("bigint")
    )
    mixed = temperature_mix(docs, "source", F.col("doc_id"), "n_tok", alpha=0.5)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
    )


# --------------------------------------------------------------------------
# end-to-end pretraining corpus pipeline
# --------------------------------------------------------------------------


def q_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composition: quality gate -> benchmark
    decontamination -> exact dedup -> temperature mix, reported per
    source — the full pretraining-corpus build in ONE lazy plan.

    Stage order matters (and the oracle replays it exactly): cheap
    map-side gates run first so every later shuffle sees fewer rows;
    decontamination's broadcast gram join runs before dedup so a
    contaminated duplicate can't survive via its clean twin; the
    temperature thresholds are computed on the CLEANED corpus, not the
    raw one.  Every stage is a reused operator (word_count /
    decontaminate / md5-group dedup / temperature_mix) — composition is
    plan-level, so Catalyst still sees one DAG and prunes columns
    through all four stages."""
    from lexam_data_pipeline_spark.ml.decontam import decontaminate

    docs = load_table(spark, sf_dir, "documents", fan=True).withColumn(
        "n_tok", word_count(F.col("text")).cast("bigint")
    )
    # 1. quality gate (map-side)
    ok = docs.where(F.col("n_tok") >= 20)
    # 2. decontamination vs the held-out split (every 10th doc)
    bench = ok.where(F.col("doc_id") % 10 == 0)
    corpus = ok.where(F.col("doc_id") % 10 != 0)
    dirty = decontaminate(corpus, bench, n=6).select("doc_id")
    clean = corpus.join(dirty, "doc_id", "left_anti")
    # 3. exact dedup, first (lowest doc_id) copy wins
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = clean.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    # 4. temperature mix on the cleaned corpus
    mixed = temperature_mix(deduped, "source", F.col("doc_id"), "n_tok", alpha=0.5)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
    )


# --------------------------------------------------------------------------
# context-window chunking & deterministic split assignment
# --------------------------------------------------------------------------


def chunk_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the pretraining context-window chunker (GPT-style packing keeps a
    ``window - stride`` token overlap so no span is only ever seen cut
    in half).

    Pure Catalyst: ``sequence`` generates the chunk starts per row and
    ``posexplode`` fans them out, so chunking is map-side only — zero
    shuffles, and at 100 TB each executor chunks its own partition.
    ``slice`` is 1-based; start offsets are 0-based token positions."""
    from lexam_data_pipeline_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)
    )
    return toks.select(
        id_col,
        "__n",
        "__toks",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.least(F.lit(window), F.col("__n") - F.col("chunk_start"))
        .cast("int")
        .alias("n_chunk_tokens"),
        F.element_at("__toks", F.col("chunk_start") + 1).alias("first_tok"),
    )


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk rows for the 32-token / stride-24 context-window
    chunking of every document (see :func:`chunk_windows`)."""
    return chunk_windows(load_table(spark, sf_dir, "documents"))


def split_assign(key: Column, salt: str = "split") -> Column:
    """Deterministic train/val/test assignment from the first hex char of
    ``md5(salt || key)``: 12/16 train, 2/16 val, 2/16 test.

    Hash-based (not rand()-based) for the same reasons as hash_bucket:
    stable under repartition/retry/engine, and the assignment travels
    with the row forever — a doc can never leak from test into train on
    a later pipeline run."""
    c = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 1)
    return (
        F.when(c.isin(*"0123456789ab"), "train")
        .when(c.isin("c", "d"), "val")
        .otherwise("test")
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus split manifest: doc counts and token mass per
    (source, split) under the deterministic 75/12.5/12.5 hash split."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "split", split_assign(F.col("doc_id"))
    )
    return docs.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(word_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key: Column,
    k: int,
    salt: str = "ws1",
) -> DataFrame:
    """Deterministic weighted top-k sample WITHOUT floating point.

    A-Res weighted reservoir sampling ranks items by ``u^(1/w)`` — but
    ``ln``/``pow`` are libm calls whose last-ulp behavior differs across
    engines, which would poison cross-engine reproducibility.  This uses
    the exact integer-only equivalent: the max of ``w`` iid uniform
    hashes is distributed as ``u^(1/w)``, so each row's priority is
    ``max over i<w of md5(salt:key:i)`` — pure string/hash ops, identical
    everywhere, and items with weight ``w`` win proportionally more.

    Cost: explode factor = E[w] (the weight budget), then a map-side-
    combinable max per key and an exact top-k (TakeOrderedAndProject).
    Integer weights only; clamp upstream.
    """
    w = weight.cast("int").alias("w")
    keyed = df.select(key.alias("__k"), w)
    h = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{salt}:"),
                F.col("__k").cast("string"),
                F.lit(":"),
                F.col("__i").cast("string"),
            )
        ),
        1,
        8,
    )
    return (
        keyed.withColumn("__i", F.explode(F.sequence(F.lit(0), F.col("w") - 1)))
        .withColumn("__h", h)
        .groupBy("__k", "w")
        .agg(F.max("__h").alias("priority"))
        .orderBy(F.desc("priority"), F.asc("__k"))
        .limit(k)
    )


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 weighted document sample, weight = 1 + n_chars % 8 (a
    deterministic stand-in for a quality score).  Longer-weighted docs
    are proportionally likelier — asserted distributionally in pytest —
    while the oracle reproduces the exact selection via the identical
    md5 replication trick."""
    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample(
        docs,
        weight=F.lit(1) + F.pmod(F.col("n_chars"), F.lit(8)),
        key=F.col("doc_id"),
        k=50,
    )
    return out.select(F.col("__k").alias("doc_id"), "w", "priority")


def kfold_assign(key: Column, k: int = 5, salt: str = "fold") -> Column:
    """Deterministic k-fold assignment (cross-validation / sharded
    evaluation): fold i gets the hash buckets in [i/k, (i+1)/k).

    Built on the same proven primitive as hash_sample/split_assign —
    fixed-width lowercase hex compares numerically, so the fold is a sum
    of k-1 threshold comparisons: pure string ops, engine-exact, stable
    under repartition/retry, and a row's fold never changes across
    pipeline runs (no eval-set leakage)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = hash_bucket(key, salt)
    fold = F.lit(0)
    for i in range(1, k):
        fold = fold + (h >= F.lit(hex_threshold(i / k))).cast("int")
    return fold.alias("fold")


def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold manifest over documents: docs and token mass per fold —
    the shard plan for cross-validated filter training or parallel eval."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fold", kfold_assign(F.col("doc_id"), k=5)
    )
    return docs.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(word_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
