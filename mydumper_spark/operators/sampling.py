"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled constantly — dev subsets, eval holdouts,
per-source rebalancing — and the sample must be (a) reproducible across
runs and engines (no RNG state, no seed files), (b) cheap (a sample must
not cost a shuffle unless it structurally needs one), and (c) stable under
re-partitioning (membership depends only on the key, never on task layout;
``df.sample()`` breaks exactly this, which is why it is not used here).

Mechanism: the first 8 hex digits of ``md5(key)`` read as a uniform 32-bit
integer — the same engine-portable digest trick as the A4 checksum
(`mydumper_spark/functions/checksum.py`), so Spark and the DuckDB oracle
agree bit-for-bit. A row is in a ``fraction`` sample iff
``h(k) < fraction * 2^32``. (A multiplicative Lehmer hash was rejected:
it is LINEAR over consecutive integer keys — a 0.2 cut kept 89% of
``range(10k)`` because small keys never wrap the modulus.)

Shuffle budget (the 100 TB argument):
- ``bernoulli_sample`` — zero shuffles: a pure filter the scan evaluates
  (md5 is a JVM built-in inside whole-stage codegen); at 1000 executors
  it is embarrassingly parallel.
- ``stratified_fractions`` — zero shuffles: the per-stratum fraction is a
  CASE chain over the stratum column, still a pure filter.
- ``stratified_fixed`` — one shuffle (hash-partition by strata for the
  row_number window); that shuffle is irreducible because "exactly n per
  stratum" is a global per-group property. Rows are pre-filtered by an
  over-sampled bernoulli gate BEFORE the exchange when ``prefilter_hint``
  is set, so only ~n·margin candidate rows per stratum cross the wire, not
  the full table.

Reference behavior: mydumper itself exposes row LIMITs per table
(`/root/reference/src/mydumper/mydumper_arguments.c` --rows/--where); these
operators are the statistically-sound analogue a data-pipeline user needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_SPACE = 1 << 32  # 8 hex digits of md5


def sample_hash(key: Column) -> Column:
    """Uniform deterministic hash in [0, 2^32): first 8 hex digits of
    ``md5(cast(key as string))``. Pure codegen, engine-portable."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")


def sample_hash_sql(expr: str) -> str:
    """The byte-identical DuckDB twin of :func:`sample_hash`."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"


def bernoulli_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Keep a row iff ``sample_hash(key) < fraction * 2^32``.

    Zero-shuffle: evaluated inside the scan. Membership is a pure function
    of the key — re-runs, re-partitions, and other engines agree exactly."""
    cut = int(fraction * HASH_SPACE)
    return df.where(sample_hash(F.col(key_col)) < cut)


def stratified_fractions(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum bernoulli sampling (e.g. keep 100% of 'rare-lang' docs,
    2% of 'en') — the rebalancing primitive for skewed corpora.

    Still zero-shuffle: the per-stratum cut is a CASE chain on the stratum
    column; Catalyst folds it into one scan-side predicate."""
    h = sample_hash(F.col(key_col))
    cut = F.lit(int(default_fraction * HASH_SPACE))
    for value, frac in sorted(fractions.items()):
        cut = F.when(F.col(stratum_col) == value, int(frac * HASH_SPACE)).otherwise(cut)
    return df.where(h < cut)


def stratified_fixed(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    prefilter_hint: float | None = None,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen in hash order
    (deterministic "random" order, ties broken by key).

    One irreducible shuffle for the per-stratum window. With
    ``prefilter_hint`` (an upper-bound estimate of n/stratum_size), a
    bernoulli gate drops most rows BEFORE the exchange — the over-sampling
    margin keeps every stratum's top-n intact as long as the hint is not an
    under-estimate; leave it None when stratum sizes are unknown."""
    h = sample_hash(F.col(key_col))
    if prefilter_hint is not None:
        df = df.where(h < int(min(1.0, prefilter_hint) * HASH_SPACE))
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float = 0.01
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive train/holdout split on the same hash — the
    standard eval-contamination guard. Both sides are pure filters of the
    same scan; a row can never migrate between splits across runs.

    Caveat: membership hashes the ROW key, so two near-duplicate documents
    can land on opposite sides — a near-copy of a holdout doc leaking into
    train. Use :func:`cluster_safe_split` with a near-dup cluster map when
    that leakage matters (it always does for eval sets)."""
    cut = int(holdout_fraction * HASH_SPACE)
    h = sample_hash(F.col(key_col))
    return df.where(h >= cut), df.where(h < cut)


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    holdout_fraction: float = 0.01,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Leakage-safe train/holdout assignment: split membership hashes the
    near-dup CLUSTER id, never the document id, so an entire cluster lands
    on one side — a near-duplicate of a holdout document structurally
    cannot appear in train. ``clusters`` maps ``id_col → cluster_col``
    (e.g. from connected_components over verified MinHash pairs); docs
    absent from the map are singletons (cluster = own id).

    Returns (id, cluster, split) with split ∈ {'train','holdout'}. One
    broadcast-or-hash join against the cluster map (clusters ≪ corpus:
    only multi-doc clusters need rows); the hash itself is scan-side
    codegen, so the split adds no extra shuffle beyond that join."""
    cut = int(holdout_fraction * HASH_SPACE)
    joined = (
        df.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(cluster_col), F.col(id_col)).alias(cluster_col),
        )
    )
    h = sample_hash(F.col(cluster_col))
    return joined.select(
        id_col,
        cluster_col,
        F.when(h < cut, F.lit("holdout")).otherwise(F.lit("train")).alias("split"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    n: int = 100,
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group document cap (the RefinedWeb/CCNet per-domain hygiene
    rule): keep at most ``n`` rows per group, deterministically.

    Selection order inside a group: ``order_col`` DESCENDING when given
    (e.g. keep the n highest-quality docs), else a stable uniform shuffle
    by ``sample_hash(id)`` — taking the FIRST n ids would bias toward
    whatever happened to be crawled/ingested first; the hash order is a
    reproducible lottery. Id tie-break makes the result total-ordered and
    engine-portable.

    One irreducible exchange ("at most n per group" is a global per-group
    property); row_number state is one counter per group, so a mega-domain
    costs sort, not memory. When ``n ≪`` group size, pre-filter with
    :func:`bernoulli_sample` at an over-sampled fraction first (the
    ``stratified_fixed`` prefilter pattern) so only candidates cross the
    wire."""
    order = (
        [F.col(order_col).desc()] if order_col else []
    ) + [sample_hash(F.col(id_col)).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def mix_corpus(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus mixing — the "data recipe" step of a training
    pipeline: for each group (source/domain/language), take documents in
    deterministic ``sample_hash(id)`` order until that group's token
    budget is reached. The first document to cross the budget is INCLUDED
    (budgets fill to at least the target unless the group runs dry);
    groups absent from ``budgets`` are dropped entirely.

    Returns the selected rows plus (n_tokens, __pre) so callers can audit
    the fill. One exchange (the per-group prefix sum over hash order);
    token counting is scan-side codegen. At 100 TB the budgets dict is a
    handful of literals folded into a CASE chain — no join, no broadcast,
    no driver data movement."""
    from mydumper_spark.operators.dedup import tokens

    if not budgets:
        raise ValueError("budgets must name at least one group")
    budget = None
    for k, v in budgets.items():
        budget = (
            F.when(F.col(group_col) == k, F.lit(int(v)))
            if budget is None
            else budget.when(F.col(group_col) == k, F.lit(int(v)))
        )
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    with_pre = (
        df.where(budget.isNotNull())
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "__pre",
            F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return with_pre.where(F.col("__pre") < budget)


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — the training-order randomization
    every corpus gets before sequence packing. Order = ascending 60-bit
    ``md5(seed:id)`` (engine-portable, reproducible across runs and
    engines; change ``seed`` for a fresh epoch order, no RNG state).

    Scale shape: with ``n_shards`` the rows hash into that many ordered
    shards (``__shard`` column, ascending with the key) and sort only
    WITHIN shards — one exchange plus local sorts, no single global
    merge; consuming files shard-by-shard yields the full shuffled order.
    Without ``n_shards`` the result is a true total order (a full sort —
    fixture/oracle scale; at 100 TB always set shards).

    Returns the input columns + ``shuffle_key`` (+ ``__shard`` when
    sharded), ordered."""
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(int(seed)), F.col(id_col).cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("bigint").alias("shuffle_key")
    with_key = df.withColumn("shuffle_key", key)
    if n_shards:
        # RANGE buckets (not mod): each shard holds a contiguous key
        # interval, so reading shards 0..n-1 in order reproduces the
        # exact global shuffled order without any global sort/merge.
        # repartitionByRange (NOT hash repartition) lays partitions out in
        # shard order, so the physical file order written by a consumer
        # matches the permutation order too — a hash exchange would
        # scatter shards across files and the file-sequence contract
        # would only hold after an explicit ORDER BY __shard.
        width = (1 << 60) // int(n_shards) + 1
        shard = F.expr(f"shuffle_key div {width}")
        return (
            with_key.withColumn("__shard", shard)
            .repartitionByRange(int(n_shards), "__shard", F.col("shuffle_key"),
                                F.col(id_col))
            .sortWithinPartitions("__shard", "shuffle_key", id_col)
        )
    return with_key.orderBy("shuffle_key", id_col)


def _small_rational(alpha: float) -> "tuple[int, int] | None":
    """α as a small exact fraction p/q (q ≤ 64) via its DECIMAL spelling —
    ``str(0.3)`` is ``'0.3'`` (repr round-trips the shortest spelling), so
    the user's intended rational survives the float detour. None when no
    small form exists (→ the float-pow fallback)."""
    from fractions import Fraction

    try:
        f = Fraction(str(alpha))
    except ValueError:
        return None
    if f <= 0 or f.denominator > 64:
        return None
    return f.numerator, f.denominator


def _int_kth_root(x: int, k: int) -> int:
    """floor(x^(1/k)) in exact big-int arithmetic: float seed, integer
    correction — the same trick the DuckDB oracle twin replays (float
    seed + HUGEINT power comparisons), so both engines land on the
    identical integer for any x."""
    if x < 0 or k < 1:
        raise ValueError("x must be >= 0, k >= 1")
    if x == 0:
        return 0
    if x.bit_length() < 1000:
        r = max(1, int(round(float(x) ** (1.0 / k))))
    else:
        # float(x) raises OverflowError past ~1.8e308 (reachable: N^p with
        # α=63/64 and big group counts) — seed from an over-estimate via
        # bit_length and converge with integer Newton (monotone decreasing
        # from above), leaving the same ±1 correction loops to finish
        r = 1 << ((x.bit_length() + k - 1) // k)
        while True:
            nr = ((k - 1) * r + x // r ** (k - 1)) // k
            if nr >= r:
                break
            r = nr
    while r**k > x:
        r -= 1
    while (r + 1) ** k <= x:
        r += 1
    return r


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual-LM sampling
    rule (Conneau & Lample 2019; XLM-R trains with α=0.3): target share
    q_g ∝ N_g^α flattens the observed group distribution, so head groups
    downsample and tail groups keep everything. Unlike
    :func:`stratified_fractions` the fractions are COMPUTED from the
    corpus, not user-supplied: per-doc acceptance is
    ``min(1, q_g / observed_share_g)`` rendered as an integer hash
    threshold.

    α=0.5 (the default) is engine-exact: weights are ``floor(sqrt(N_g))``
    — IEEE sqrt is correctly rounded, so the floor is identical in every
    engine — and every step after that is exact integer arithmetic
    (Python big-ints on the driver; the oracle replays in HUGEINT), so
    membership is a pure function of the key. Any other RATIONAL α = p/q
    (q ≤ 64, e.g. the actual XLM-R α=0.3 = 3/10) is engine-exact too:
    weights are the integer k-th root ``floor((N^p)^(1/q))`` — computed
    with big-int arithmetic, no float pow anywhere — and the oracle
    replays the root with a float seed + exact HUGEINT correction.
    Only an α with no small rational form falls back to Python float
    pow on the driver (deterministic per run, no exact SQL twin).

    Scale shape: one count aggregate (group cardinality is languages/
    domains — thousands at most, driver-plane), then a scan-side CASE
    threshold filter — zero additional shuffles, the
    stratified_fractions plan."""
    import math

    # NULL-safe ordering key: real corpora carry NULL lang/domain values,
    # and a None key must neither crash the driver sort (None vs str is
    # unorderable) nor silently vanish from the output — NULL is a group
    # like any other and gets its own threshold.
    def _gkey(g):
        return (g is None, g)

    rows = df.groupBy(group_col).count().collect()
    counts = {r[group_col]: r["count"] for r in rows}
    total = sum(counts.values())
    frac = _small_rational(alpha)
    if alpha == 0.5:
        w = {g: int(math.floor(math.sqrt(n))) for g, n in counts.items()}
        sw = sum(w.values())
        cuts = {g: min(HASH_SPACE, HASH_SPACE * w[g] * total // (sw * n))
                for g, n in counts.items()}
    elif frac is not None:
        # exact rational path: α = p/q ⇒ weight = floor((N^p)^(1/q)),
        # big-int throughout — same convention (and same oracle contract)
        # as the floor(sqrt) α=0.5 fast path
        p, q = frac
        w = {g: _int_kth_root(int(n) ** p, q) for g, n in counts.items()}
        sw = sum(w.values())
        cuts = {g: min(HASH_SPACE, HASH_SPACE * w[g] * total // (sw * n))
                for g, n in counts.items()}
    else:
        w = {g: float(n) ** alpha for g, n in counts.items()}
        sw = sum(w[g] for g in sorted(w, key=_gkey))  # fixed order:
        # reproducible sum
        cuts = {g: min(HASH_SPACE,
                       int(HASH_SPACE * (w[g] * total) / (sw * n)))
                for g, n in counts.items()}
    h = sample_hash(F.col(key_col))
    cut = F.lit(0)
    for g, c in sorted(cuts.items(), key=lambda kv: _gkey(kv[0])):
        # eqNullSafe: a plain == against a NULL group value never matches,
        # which would drop every NULL-group row regardless of threshold
        cut = F.when(F.col(group_col).eqNullSafe(F.lit(g)),
                     F.lit(int(c))).otherwise(cut)
    return df.where(h < cut)


def _bucket_order(df: DataFrame, id_col: str):
    """Monotone-in-id integer expression for range bucketing. Numeric ids
    bucket on their own value; STRING ids (UUIDs, URL hashes) bucket on the
    big-endian integer of their first 8 UTF-8 bytes — Spark compares
    strings bytewise (UTF8String), so the zero-right-padded prefix integer
    is monotone non-decreasing in id order: buckets stay CONTIGUOUS id
    ranges, equal-prefix ids merely share a bucket, and the in-bucket
    window still orders by the TRUE id, so selection remains exact and
    hash-identical to the naive-window oracle (unlike hashing, which would
    reorder ties)."""
    from pyspark.sql import types as T

    if isinstance(df.schema[id_col].dataType, T.StringType):
        return F.conv(
            F.rpad(F.substring(F.hex(F.encode(F.col(id_col), "UTF-8")),
                               1, 16), 16, "0"),
            16, 10,
        ).cast("decimal(38,0)")
    return F.col(id_col)


def _ord_lit(v):
    """Literal for a _bucket_order value: plain bigint when it fits,
    decimal(38,0) via string otherwise (8-byte prefixes reach 2^64-1,
    past F.lit's int64 range)."""
    v = int(v)
    if -(1 << 63) <= v < (1 << 63):
        return F.lit(v)
    return F.lit(str(v)).cast("decimal(38,0)")


def budget_select(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    budget: int | None = None,
    id_col: str = "doc_id",
    id_buckets: int = 4096,
    budget_fraction: "tuple[int, int] | None" = None,
    materialize: bool = True,
) -> DataFrame:
    """Token-budget-constrained selection: fill a training-token ``budget``
    with the best-scoring documents — order by (score DESC, id ASC), keep
    the maximal prefix whose running token sum stays ≤ budget. This is the
    last step of every curation pipeline ("we can afford 1T tokens; take
    the best 1T of the 5T we curated").

    The textbook form is a running-sum window over a GLOBAL sort — on
    Spark that is ``Window.orderBy(...)`` with no partition key: every row
    through ONE task, the anti-pattern that dies first at 100 TB. Instead
    the cutoff is located hierarchically, all integer-exact:

    1. one aggregate per distinct score (score is an integer ppm-style
       metric → cardinality is bounded by its SCALE, ~1e6 rows max, a
       driver-plane cumsum);
    2. every doc strictly above the threshold score is selected by a pure
       scan-side filter (no ordering anywhere);
    3. only the BOUNDARY score's docs — the one group the budget splits —
       need intra-group ordering by id; they are themselves thresholded by
       a second histogram over ``id_buckets`` range buckets of the id
       (range buckets preserve id order), leaving a single bucket
       (~1/id_buckets of one score group) for the final exact
       running-sum window.

    Every count is integer; ties break on the id; the result set is a
    pure function of the data — the DuckDB oracle replays it with the
    naive window and matches hash-exact.

    ``budget`` is absolute tokens; ``budget_fraction=(p, q)`` instead
    derives it as total_tokens·p//q FROM pass 1's histogram (no extra
    scan). ``materialize`` localCheckpoints the input once — the
    threshold machinery reads the frame 4-5 times, and re-deriving a
    scored projection (e.g. tokenizing text) on every pass would
    dominate the cost; pass a SLIM frame (id, score, tokens)."""
    if (budget is None) == (budget_fraction is None):
        raise ValueError("pass exactly one of budget / budget_fraction")
    if materialize:
        df = df.localCheckpoint(eager=False)
    score, toks, did = F.col(score_col), F.col(tokens_col), F.col(id_col)

    # pass 1: per-score token totals (bounded by score cardinality)
    hist = (df.groupBy(score_col).agg(F.sum(toks).alias("t"))
            .collect())
    if budget_fraction is not None:
        p, q = budget_fraction
        budget = sum(int(r["t"]) for r in hist) * p // q
    # NULL scores rank last (worst), same None-safe rule as
    # temperature_mix — they must neither crash the sort nor vanish
    hist.sort(key=lambda r: (r[score_col] is not None,
                             r[score_col] if r[score_col] is not None
                             else 0),
              reverse=True)
    cum = 0
    found = False
    thr_score = None       # the score whose group the budget splits
    remaining = budget     # budget left when we reach the boundary group
    for r in hist:
        if cum + int(r["t"] or 0) > budget:
            thr_score = r[score_col]
            remaining = budget - cum
            found = True
            break
        cum += int(r["t"] or 0)
    if not found:  # whole corpus fits
        return df
    if thr_score is None:  # the budget splits the NULL-score group
        selected_above = df.filter(score.isNotNull())
        boundary = df.filter(score.isNull())
    else:
        selected_above = df.filter(score > F.lit(thr_score))
        boundary = df.filter(score.eqNullSafe(F.lit(thr_score)))
    # remaining == 0 (budget exhausted exactly at the group boundary) is
    # NOT an early return: the naive running-sum oracle still keeps the
    # boundary group's leading zero-token docs (their cumulative sum never
    # advances past the budget), and the bucket machinery below reproduces
    # exactly that — full buckets are the all-zero-token prefix, the edge
    # window keeps rows with _cum <= 0.

    # pass 2: range-bucket histogram over the boundary group's ids
    ordv = _bucket_order(df, id_col)
    lo, hi = boundary.agg(F.min(ordv), F.max(ordv)).first()
    width = max(1, (int(hi) - int(lo)) // id_buckets + 1)
    bucket = ((ordv - _ord_lit(lo)) / F.lit(width)).cast("bigint")
    bhist = (boundary.groupBy(bucket.alias("b"))
             .agg(F.sum(toks).alias("t")).collect())
    bhist.sort(key=lambda r: r["b"])
    bcum = 0
    thr_bucket = None
    b_remaining = remaining
    for r in bhist:
        if bcum + int(r["t"] or 0) > remaining:
            thr_bucket = r["b"]
            b_remaining = remaining - bcum
            break
        bcum += int(r["t"] or 0)
    if thr_bucket is None:
        return selected_above.unionByName(boundary)
    full_buckets = boundary.filter(bucket < F.lit(int(thr_bucket)))
    edge = boundary.filter(bucket == F.lit(int(thr_bucket)))

    # final exact prefix inside ONE bucket (~group/id_buckets rows): the
    # only place a single-partition running-sum window ever runs
    w = Window.orderBy(did)
    edge_sel = (edge.withColumn("_cum", F.sum(toks).over(w))
                .filter(F.col("_cum") <= F.lit(int(b_remaining)))
                .drop("_cum"))
    return selected_above.unionByName(full_buckets).unionByName(edge_sel)


def budget_select_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tokens_col: str,
    budget_fraction: "tuple[int, int] | None" = None,
    budgets: "dict | None" = None,
    id_col: str = "doc_id",
    id_buckets: int = 4096,
    materialize: bool = True,
) -> DataFrame:
    """Per-group token budgeting — the multilingual form of
    :func:`budget_select`: every group (language, domain, source) gets its
    OWN budget, filled with its own best documents by (score DESC, id ASC)
    maximal prefix. ``budgets`` maps group → absolute tokens;
    ``budget_fraction=(p, q)`` gives every group p/q of its own total.

    Scale shape: the naive form is a window PARTITIONED BY group — which
    shuffles the corpus by group and hands each language to ONE task
    (language distributions are exactly the skew this breaks under: 'en'
    is half the corpus). Here group count only widens two bounded
    aggregates: one (group, score) histogram locates every group's
    boundary score on the driver; everything strictly above selects via a
    broadcast-literal CASE filter (no shuffle at all); and ALL split
    groups resolve together — one min/max-id aggregate, one
    (group, id-bucket) histogram, one partitioned window over ONLY the
    edge buckets (≤ groups × group/4096 rows) — a constant number of jobs
    regardless of group count. NULL groups are groups (temperature_mix's
    None-safe rule); all arithmetic is integer-exact, so the DuckDB
    oracle's naive partitioned window matches hash-exact."""
    if (budgets is None) == (budget_fraction is None):
        raise ValueError("pass exactly one of budgets / budget_fraction")
    if materialize:
        df = df.localCheckpoint(eager=False)
    g, score, toks, did = (F.col(group_col), F.col(score_col),
                           F.col(tokens_col), F.col(id_col))

    def geq(col, val):  # NULL-safe group match
        return col.eqNullSafe(F.lit(val))

    # pass 1: (group, score) histogram — bounded by groups × score scale
    hist = (df.groupBy(group_col, score_col).agg(F.sum(toks).alias("t"))
            .collect())
    per_group: dict = {}
    for r in hist:
        per_group.setdefault(r[group_col], []).append(
            (r[score_col], int(r["t"] or 0)))
    if budget_fraction is not None:
        p, q = budget_fraction
        budgets = {gv: sum(t for _, t in rows) * p // q
                   for gv, rows in per_group.items()}
    keep_all: list = []          # groups whose whole corpus fits
    thr: dict = {}               # group → (boundary score, remaining)
    for gv, rows in per_group.items():
        rows.sort(key=lambda st: (st[0] is not None,
                                  st[0] if st[0] is not None else 0),
                  reverse=True)
        budget = int(budgets.get(gv, 0))
        cum = 0
        for s, t in rows:
            if cum + t > budget:
                thr[gv] = (s, budget - cum)
                break
            cum += t
        else:
            keep_all.append(gv)

    def _case(groups_vals, build):
        """OR-chain of per-group conditions (group count is bounded)."""
        cond = F.lit(False)
        for gv in groups_vals:
            cond = cond | (geq(g, gv) & build(gv))
        return cond

    above = df.filter(_case(keep_all, lambda gv: F.lit(True)) | _case(
        [gv for gv in thr],
        # a NULL boundary score means the budget ran out inside the
        # group's NULL-score tail — every non-NULL-score doc of that
        # group sorted before it and fits
        lambda gv: (score > F.lit(thr[gv][0])) if thr[gv][0] is not None
        else score.isNotNull()))
    # rem == 0 groups stay in the split set: the naive partitioned-window
    # oracle keeps their boundary-score zero-token prefix (cumsum never
    # advances past the budget), and the edge machinery reproduces that
    split = {gv: rem for gv, (s, rem) in thr.items()}
    if not split:
        return above
    bmatch = _case(
        list(split),
        lambda gv: score.eqNullSafe(F.lit(thr[gv][0])))
    boundary = df.filter(bmatch)

    # all split groups' id ranges in ONE aggregate, then ONE bucket
    # histogram with per-group widths (ordv: numeric ids as-is, string
    # ids via the monotone 8-byte-prefix integer — _bucket_order)
    ordv = _bucket_order(df, id_col)
    ranges = {r[group_col]: (int(r["lo"]), int(r["hi"]))
              for r in boundary.groupBy(group_col)
              .agg(F.min(ordv).alias("lo"), F.max(ordv).alias("hi"))
              .collect()}
    width = {gv: max(1, (hi - lo) // id_buckets + 1)
             for gv, (lo, hi) in ranges.items()}
    bucket = F.lit(None).cast("bigint")
    for gv in split:
        lo = ranges[gv][0]
        bucket = F.when(
            geq(g, gv),
            ((ordv - _ord_lit(lo)) / F.lit(width[gv])).cast("bigint")
        ).otherwise(bucket)
    bhist = (boundary.withColumn("__b", bucket)
             .groupBy(group_col, "__b").agg(F.sum(toks).alias("t"))
             .collect())
    per_gb: dict = {}
    for r in bhist:
        per_gb.setdefault(r[group_col], []).append((int(r["__b"]),
                                                    int(r["t"] or 0)))
    full_cond = F.lit(False)
    edge_thr: dict = {}          # group → (edge bucket, remaining)
    for gv, rows in per_gb.items():
        rows.sort()
        rem = split[gv]
        cum = 0
        for b, t in rows:
            if cum + t > rem:
                edge_thr[gv] = (b, rem - cum)
                full_cond = full_cond | (geq(g, gv)
                                         & (bucket < F.lit(b)))
                break
            cum += t
        else:
            full_cond = full_cond | geq(g, gv)
    full = boundary.filter(full_cond)
    if not edge_thr:
        return above.unionByName(full)

    # final exact prefixes: one partitioned window over ONLY edge buckets
    edge = boundary.filter(_case(
        list(edge_thr), lambda gv: bucket == F.lit(int(edge_thr[gv][0]))))
    w = Window.partitionBy(group_col).orderBy(did)
    rem_col = F.lit(None).cast("bigint")
    for gv, (_, rem) in edge_thr.items():
        rem_col = F.when(geq(g, gv), F.lit(int(rem))).otherwise(rem_col)
    edge_sel = (edge.withColumn("_cum", F.sum(toks).over(w))
                .filter(F.col("_cum") <= rem_col).drop("_cum"))
    return above.unionByName(full).unionByName(edge_sel)


def repeat_by_weight(
    df: DataFrame,
    weight_ppm_col: str = "weight_ppm",
    id_col: str = "doc_id",
    seed: int = 0,
    epoch_col: str = "epoch",
    max_copies: int = 64,
) -> DataFrame:
    """Materialize a weighted corpus as physical rows: each document
    appears ``weight_ppm // 1e6`` times plus one more with probability
    ``(weight_ppm % 1e6) / 1e6`` — the step that turns mixing WEIGHTS
    (soft_dedup_weights' ppm column, a rare-language upsampling factor, a
    DoReMi domain weight) into the repeated-epoch dataset a trainer
    actually reads. The fractional coin is ``sample_hash('repeat:seed:'
    || id) % 1e6`` — a pure function of (seed, id), so re-runs, other
    partitionings, and the DuckDB oracle produce the identical copy set
    (no rand(): the repo-wide determinism rule). Output rows carry
    ``epoch_col`` = 1..n, so downstream shuffles can keep copies apart.

    Scale shape: zero shuffles — copy count is a scan-side expression and
    the fan-out is one ``explode(sequence(1, n))`` per row (rows with
    n = 0 vanish through the empty array, an intentional integer-exact
    Bernoulli drop for weights < 1e6). Output size is Σ weights — the
    trainer's epoch budget, not an amplification surprise; ``max_copies``
    hard-fails (scan-side assert, no extra pass) on weights so large one
    bad row would fan out into a hot partition.
    """
    w = F.col(weight_ppm_col).cast("bigint")
    coin = F.pmod(
        sample_hash(F.concat(F.lit(f"repeat:{int(seed)}:"),
                             F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    n = (F.expr(f"CAST({weight_ppm_col} AS BIGINT) DIV 1000000")
         + F.when(coin < w % 1_000_000, F.lit(1)).otherwise(F.lit(0))
         ).cast("bigint")
    # assert_true is NULL on pass; folding it through coalesce forces
    # per-row evaluation without a separate validation pass over the data.
    # ONE assert covers both contracts: the isNotNull conjunct keeps the
    # condition FALSE (not NULL) for a NULL weight — without it the range
    # check itself goes NULL, which assert_true treats as failure but
    # with the max_copies message (and a NULL-concat'd, blank error
    # text): a misleading diagnosis for missing input — and the CASE in
    # the message names the actual offense.
    guarded = F.coalesce(
        F.assert_true(
            w.isNotNull() & (w >= 0) & (n <= F.lit(int(max_copies))),
            F.when(
                w.isNull(),
                F.concat(
                    F.lit("repeat_by_weight: NULL weight_ppm for "),
                    F.coalesce(F.col(id_col).cast("string"),
                               F.lit("<null id>")),
                    F.lit(" — weights must be non-null (coalesce "
                          "upstream to 0 to drop, 1000000 to keep)")),
            ).when(
                w < 0,
                F.concat(
                    F.lit("repeat_by_weight: negative weight_ppm="),
                    w.cast("string"),
                    F.lit(" for "),
                    F.coalesce(F.col(id_col).cast("string"),
                               F.lit("<null id>")),
                    F.lit(" — weights are non-negative ppm counts")),
            ).otherwise(
                F.concat(
                    F.lit(f"repeat_by_weight: copy count exceeds "
                          f"max_copies={int(max_copies)} (weight_ppm="),
                    w.cast("string"), F.lit(")"))),
        ).cast("bigint"),
        n,
    )
    epochs = F.when(guarded >= 1,
                    F.sequence(F.lit(1).cast("bigint"), guarded)
                    ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
    return df.withColumn(epoch_col, F.explode(epochs))
