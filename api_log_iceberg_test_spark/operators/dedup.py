"""Deduplication operators for document corpora.

Four tiers, increasing recall for near-duplicates, all designed for 100 TB:

1. :func:`exact_dedup` — byte-identical texts. One hash-shuffle on the
   dedup key; partial aggregation makes the shuffle carry one row per
   distinct key per partition.
2. :func:`normalized_dedup` — md5 over whitespace/case-normalized text.
   Same plan shape; the normalization is a codegen'd projection.
3. :func:`ngram_jaccard_pairs` — *exact* n-gram Jaccard over candidate
   pairs found by deterministic prefix-shingle blocking. Hash-free and
   SQL-expressible, so it doubles as the differential oracle for tier 4.
4. :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH, the scale
   path: signature computation is a narrow per-row projection built from
   higher-order array functions (no explode, no shuffle); the only shuffle
   is the band-bucket self-join whose buckets are bounded by band width.

SimHash (:func:`simhash_signatures`, :func:`simhash_pairs`) covers the
bit-sampling family: 64-bit signatures packed into a long, candidates via
16-bit band equality, verified by Hamming distance (``bit_count(xor)``).

All tiers are pure ``pyspark.sql.functions`` expressions — zero Python UDFs,
so every plan stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import fan_out


def _docs_fanned(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _t) projection widened to cluster parallelism.

    The shingle/tokenize regex passes below are the dominant per-row cost
    of every dedup tier, and they run in the map stage FEEDING the first
    exchange — i.e. at the SCAN's parallelism. A narrow input (one file /
    one row group: the bench fixtures, or one fat unsplittable file at
    ingest) pins that regex pass to ONE core regardless of cluster size
    (optimization guide §2: remove the serial stage, not the work).
    ``fan_out`` round-robins only when the scan is narrower than the
    cluster, so at 100 TB (thousands of splits) it is a no-op and no extra
    exchange appears in the plan. Row order past this point changes, which
    is safe here: every downstream consumer is an aggregate/join on id or
    a per-row projection (asserted by the oracle hash checks).
    """
    return fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )

def _pairs_from_buckets(
    keyed: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    carry: list[str] | None = None,
) -> DataFrame:
    """Distinct candidate id pairs (id_a < id_b) sharing a blocking key —
    via ONE per-key set aggregate + in-row i<j combinations instead of the
    bucket SELF-JOIN (r16, guide §2.3 "aggregate before you shuffle"; the
    same rewrite that took graph.cooccurrence_edges from 2.9 s to 1.7 s in
    r15).

    The self-join shape shuffled the keyed explode, sorted/probed it
    against itself, emitted s² rows per bucket BEFORE the id_a < id_b
    filter, then paid a dedup shuffle. Here each bucket shuffles once into
    a map-side-combinable ``collect_set``, and the sorted in-bucket id
    array expands to exactly the i < j combinations in-row. Output set is
    identical: the self-join's (a.id < b.id over the bucket cross product,
    deduped) is precisely all unordered id pairs within a bucket, deduped
    across buckets — what the combination expansion emits. Per-bucket
    state is s ids (the same s the join held in one partition to build its
    s² output), so the skew bound is unchanged; pathological buckets are
    dropped upstream by :func:`cap_buckets` exactly as before.

    ``carry`` lists key columns to keep on the output pairs (e.g. the
    sweep's ``bands`` config id); pair dedup then runs per carry-group.
    """
    carry = carry or []
    sets = keyed.groupBy(*key_cols).agg(
        F.sort_array(F.collect_set(id_col)).alias("_ids")
    )
    return (
        sets.select(*carry, "_ids", F.posexplode("_ids").alias("_i", "id_a"))
        .select(
            *carry,
            "id_a",
            F.explode(
                F.slice("_ids", F.col("_i") + F.lit(2), F.size("_ids"))
            ).alias("id_b"),
        )
        .dropDuplicates([*carry, "id_a", "id_b"])
    )


# Mersenne prime 2^31-1: modulus for the MinHash universal-hash family.
# Chosen so a·h+b never exceeds int64 under ANSI arithmetic (a, h < 2^31 ⇒
# product < 2^62). A 31-bit minhash space adds ~|shingles|/2^31 collision
# noise per permutation — immaterial for dedup banding.
_MERSENNE31 = (1 << 31) - 1


def minhash_ab(seed: int, num_perm: int) -> list[tuple[int, int]]:
    """The (a_i, b_i) permutation-constant family shared by EVERY MinHash
    site (signature HOF, LSH pipeline, parameter sweep) — one definition,
    so a seed-mixing tweak cannot silently diverge the variants that tests
    assert produce identical signatures."""
    return [
        (
            (((seed + 2 * i + 1) * 0x9E3779B1) % _MERSENNE31) + 1,
            ((i + 1) * 0x85EBCA77) % _MERSENNE31,
        )
        for i in range(num_perm)
    ]


def band_key_structs(bands: int, rows_per_band: int):
    """Banding key expression shared by the LSH pipeline and the parameter
    sweep: explode-ready array of (band, bhash) structs over a ``sig``
    array column — bhash = xxhash64 over the band's signature slice."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    F.concat_ws(
                        ",", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                    ),
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )


# ---------------------------------------------------------------------------
# Tier 1-2: exact / normalized
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exactly-identical key.

    Plan: partial agg → shuffle on `key` → final agg. At 100 TB, shuffling
    long text values is wasteful — prefer :func:`normalized_dedup` which
    shuffles a 128-bit hash instead.
    """
    return df.groupBy(key).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim: the canonical dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def normalized_dedup(df: DataFrame, key: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Dedup on md5 of normalized text — the hash, not the text, shuffles.

    The normalize+md5 projection runs after ``fan_out`` so a narrow scan
    (single file/row group) doesn't serialize it on one core; no-op on
    wide scans (r15, guide §2)."""
    return (
        fan_out(df)
        .withColumn("text_hash", F.md5(normalize_text(key)))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Shingling (shared by tiers 3-4)
# ---------------------------------------------------------------------------


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Overlapping n-grams are extracted with a single word-anchored
    regex lookahead (``(?:^| )(?=(\\S+ \\S+ \\S+))``) over the
    whitespace-normalized text. ``regexp_extract_all`` is codegen'd;
    the equivalent higher-order-function pipeline
    (transform(sequence) → slice → concat_ws) is CodegenFallback and
    benches ~7× slower on a 54-token-average corpus. Narrow (per-row)
    — no explode, so corpus size doesn't multiply before the join
    stage. Docs with < n tokens yield the whole normalized text as
    one shingle (matching the slice-truncation semantics of the HOF
    formulation).
    """
    c = F.col(col) if isinstance(col, str) else col
    # full whitespace strip at the ends (F.trim strips spaces ONLY — a
    # trailing \r/\t would otherwise leave a phantom empty token; found by
    # the hypothesis equivalence test), then collapse inner runs. \z not $:
    # Java $ matches before a final U+0085/U+2028/U+2029 line terminator
    # (none of which \s matches), so \s+$ would strip an INTERIOR space and
    # glue tokens — a NEL-terminated near-duplicate would normalize to a
    # different key than its oracle (RE2) form. Same fix at the two simhash
    # tokenizers below.
    stripped = F.regexp_replace(F.lower(c), r"^\s+|\s+\z", "")
    norm = F.regexp_replace(stripped, r"\s+", " ")
    pattern = r"(?:^| )(?=(" + " ".join([r"\S+"] * n) + r"))"
    shingle = F.regexp_extract_all(norm, F.lit(pattern), 1)
    full = F.when(
        F.size(F.split(norm, " ")) >= n, shingle
    ).otherwise(F.array(norm))
    return F.array_distinct(full)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# Tier 3: exact n-gram Jaccard with deterministic blocking
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_blocking: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard.

    Candidate blocking: each doc keys on its ``n_blocking`` lexicographically
    smallest shingles; any pair sharing one becomes a candidate (for J ≥ 0.5
    the smallest shingle of the union is very likely shared — recall is high
    while candidate count stays near-linear). Deterministic and hash-free, so
    the DuckDB oracle replicates it exactly.

    Scale: the explode is ``n_blocking`` rows/doc (not |shingles|); the join
    shuffles on short shingle strings; the post-join Jaccard is an array
    intersect on pre-deduped shingle arrays. Skew guard: a blocking key hit
    by s docs yields s² candidates, so one pathological key (a stopword-only
    shingle shared corpus-wide) dominates the join at 100 TB —
    ``max_bucket_size`` drops such keys before the self-join via
    :func:`cap_buckets` (window count on the key the join shuffles on
    anyway). Docs keep their other ``n_blocking - 1`` keys, so recall
    degrades gracefully. ``None`` (default) disables, keeping the operator
    byte-exact with its SQL oracle.
    """
    # ONE pass computes everything any consumer needs — the n_blocking
    # smallest shingles (lexicographic STRINGS, the oracle-replayable
    # blocking keys) and the xxhash64'd shingle array for verification —
    # and a lazy localCheckpoint materializes that NARROW frame once for
    # all four consumers (blocking explode ×2 via the self-join,
    # verification joins ×2). Until r15 the sharing point was a
    # repartition(id) exchange carrying the full STRING shingle arrays
    # (deriving the columns upstream of an exchange makes each consumer
    # prune a canonically different subtree, so ReuseExchange misses —
    # the checkpoint has no such trap, so derivation can move BELOW it
    # and the fat strings never ship): ~1.5 KB/doc shuffled vs ~450 B/doc
    # checkpointed (3 short strings + ~50 longs) — guide §2.3 "shuffle
    # keys and metadata instead of payloads". Measured 1.26 → 1.14 s
    # interleaved at sf0.1 with bit-identical pairs.
    # Candidates carry only ids through the join + distinct; the hash
    # arrays join back afterwards. Jaccard verification runs on
    # xxhash64'd arrays: long intersects are far cheaper than string
    # intersects and the value is identical absent a 64-bit collision
    # inside one pair (~1e-13/pair).
    # r15: the shingle regex runs AFTER fan_out so a narrow scan doesn't
    # serialize it on one core (see _docs_fanned; no-op on wide scans).
    # Checkpoint lifetime trade (ADVICE r15): localCheckpoint(eager=False)
    # frames are never explicitly unpersisted — the blocks live in executor
    # storage for the session (evictable under memory pressure, and freed
    # with the DataFrame's RDD on GC), and lineage is DROPPED, so executor
    # loss after materialization fails the job instead of recomputing.
    # Both are accepted here: the frame is answer-adjacent-sized (~450
    # B/doc), and the queries are batch jobs where a retry-from-scratch on
    # executor loss is the normal failure mode. Callers that embed this
    # operator in a long-lived session and need the storage back can
    # unpersist via the returned plan's RDD after their terminal action.
    sh = word_shingles("_t", n)
    frame = (
        _docs_fanned(df, id_col, text_col)
        .select(
            "id",
            F.slice(F.array_sort(sh), 1, n_blocking).alias("bkeys"),
            F.transform(sh, lambda s: F.xxhash64(s)).alias("hv"),
        )
        .localCheckpoint(eager=False)
    )
    keyed = cap_buckets(
        frame.select("id", F.explode("bkeys").alias("bkey")),
        ["bkey"],
        max_bucket_size,
    )
    # r16: per-bucket set aggregate + in-row combinations replaces the
    # bucket self-join (see _pairs_from_buckets — identical pair set).
    cands = _pairs_from_buckets(keyed, ["bkey"])
    hashed = frame.select("id", "hv")
    pairs = (
        cands.join(hashed.select(F.col("id").alias("id_a"), F.col("hv").alias("sh_a")), "id_a")
        .join(hashed.select(F.col("id").alias("id_b"), F.col("hv").alias("sh_b")), "id_b")
    )
    # size-ratio pre-filter: J = |∩|/|∪| ≤ min(|A|,|B|)/max(|A|,|B|), so any
    # pair failing the ratio can't reach the threshold — skips the O(|A|+|B|)
    # array_intersect for ~25% of candidates with two cheap size() reads.
    # Purely implied by the final jaccard filter ⇒ oracle unchanged.
    sa, sb = F.size(F.col("sh_a")), F.size(F.col("sh_b"))
    return (
        pairs.filter(
            F.least(sa, sb).cast("double") >= F.lit(threshold) * F.greatest(sa, sb)
        )
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "jaccard",
        )
    )


def exhaustive_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXHAUSTIVE exact word-n-gram Jaccard pairs via prefix filtering
    (the AllPairs bound of Bayardo/Ma/Srikant, WWW'07; Chaudhuri et al.'s
    SSJoin prefix filter) — recall 1 by construction, unlike
    :func:`ngram_jaccard_pairs`' 3-smallest-shingle blocking heuristic.

    Theorem (one-sided form, needing no cross-doc order argument): for
    J(A,B) ≥ t > 0, |A∩B| ≥ t·|A∪B| ≥ t·|A|, and the intersection is an
    integer, so |A∩B| ≥ ⌈t·|A|⌉. Sort A's shingle hashes ascending and
    call the first |A| − ⌈t·|A|⌉ + 1 the PREFIX: the suffix holds only
    ⌈t·|A|⌉ − 1 elements, too few to contain the whole intersection, so
    at least one shared hash lands in prefix(A). Joining every doc's
    prefix against the full inverted index therefore captures EVERY
    qualifying pair; the exact intersect then verifies. Pairs normalize
    with least/greatest, so capture through either side's prefix
    suffices.

    Cost: Σ_s prefix_df(s)·df(s) candidate rows — linear-ish on corpora
    whose shingle document-frequency is O(1), quadratic on a corpus-wide
    stopword shingle. This is the LSH sweep's bounded-sample truth tier
    (measured ~4M join rows on the 25k-doc sf1.0 half-sample); for
    full-corpus scans prefer the blocked tier and treat its recall as
    the documented heuristic. Verification runs on the same xxhash64'd
    arrays as the blocked tier, so the computed jaccard values are
    identical for pairs both tiers emit.

    Two further AllPairs-family prunes cut the candidate set BEFORE the
    array-verification joins (r12 — profiling showed verification of
    162k candidates for 56 true pairs was the sweep's dominant term):

    - **length filter at generation time** (SSJoin): J(A,B) ≥ t forces
      ``t·|B| ≤ |A| ≤ |B|/t``, so size-incompatible matches drop inside
      the hash join, never reaching the pair-dedup shuffle;
    - **positional overlap bound** (PPJoin's position information, in
      batch form): for a shared hash at 0-based sorted positions
      ``(i, j)``, every common element < h sits before i AND before j,
      every common element > h after both, so
      ``I ≤ 1 + min(i,j) + min(|A|−i−1, |B|−j−1)`` — valid per
      occurrence, tightest over a pair's matches;
    - **prefix-match-count bound** (PPJoin+'s suffix filter, batch
      form): every common element is either in one of the two PREFIXES
      — and then its (prefix, full) occurrence is a row of this very
      join, counted by the group's ``count_distinct(h)`` — or it lies
      in BOTH suffixes, so ``I ≤ c + min(|sufA|, |sufB|)`` with the
      suffix lengths exactly ``⌈t·m⌉ − 1`` (the slice complement). On
      dissimilar pairs sharing only a couple of stopword shingles this
      is the killer: c ≈ 1-2 against a required overlap of ~t·m.

    J ≥ t needs ``I ≥ ⌈t/(1+t)·(|A|+|B|)⌉`` (I is an integer; the ceil
    takes the same 1e-9-below cushion as ``plen``, weakening only), so
    pairs whose best bound misses the requirement are pruned in the
    same groupBy that deduplicates candidate pairs — position/count
    bookkeeping rides the existing shuffle for free (measured at
    sf0.1/t=0.5: 162k deduped candidates → 56 reaching verification —
    exactly the 56 true pairs, so the array-verification join now runs
    on a set the size of the ANSWER, and the sweep query's steady wall
    moved 6.3 s → ~4.8 s, back below its r10 number). All
    prunes are conservative bounds: the emitted pair set is
    bit-identical (pinned by ``test_exhaustive_tier_matches_bruteforce``'s
    exact equality against the all-pairs python reference).
    """
    if not 0.0 < threshold <= 1.0:
        # same parameter-guard idiom as lsh_param_sweep's sample_fraction
        # (ADVICE r08): threshold > 1 makes plen negative and F.slice
        # fails mid-job; threshold <= 0 degenerates the prefix to the
        # whole array (a full O(n^2) cross join). Fail at call time.
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    docs = (
        _docs_fanned(df, id_col, text_col)  # parallel shingle pass (r15)
        .select("id", word_shingles("_t", n).alias("sh"))
        .repartition(F.col("id"))
    )
    hashed = docs.select(
        "id",
        F.array_sort(
            F.transform("sh", lambda s: F.xxhash64(s))
        ).alias("hv"),
    )
    return _exhaustive_pairs_from_hashed(hashed, threshold)


def _exhaustive_pairs_from_hashed(hashed: DataFrame, threshold: float) -> DataFrame:
    """The prefix-filter/PPJoin/PPJoin+ pipeline of
    :func:`exhaustive_jaccard_pairs`, starting from its ``(id, hv)``
    frame (hv = ascending-sorted xxhash64 shingle hashes).

    Split out in r15 so :func:`lsh_param_sweep` can feed BOTH its truth
    tier and its MinHash signature branch from ONE materialized
    shingle+hash pass: the tiers live in separately compiled plans
    (localCheckpoint boundaries), where ReuseExchange cannot share the
    corpus scan, and a stage profile showed the shingle regex pass
    running 3x per sweep execution. Values are unchanged — this is the
    same code, same expressions, same join order.
    """
    m = F.size("hv")
    # ⌈t·m⌉ with a 1e-9 cushion BELOW: if the fp product lands 1 ulp
    # ABOVE an exact integer (e.g. 0.7·10), a raw ceil would overcount
    # the bound and shorten the prefix — a FALSE-NEGATIVE direction.
    # The cushion can only lengthen the prefix (superset of candidates),
    # which costs a little and never misses. Exact for t = 0.5 either way.
    plen = (m - F.ceil(F.lit(threshold) * m - F.lit(1e-9)) + 1).cast("int")
    pref = hashed.select(
        F.col("id").alias("id_p"),
        m.alias("m_p"),
        F.posexplode(F.slice("hv", F.lit(1), plen)).alias("pos_p", "h"),
    )
    full = hashed.select(
        F.col("id").alias("id_f"),
        m.alias("m_f"),
        F.posexplode("hv").alias("pos_f", "h"),
    )
    m_p, m_f = F.col("m_p"), F.col("m_f")
    # per-occurrence overlap upper bound (docstring: PPJoin position info)
    overlap_ub = (
        F.lit(1)
        + F.least("pos_p", "pos_f")
        + F.least(m_p - F.col("pos_p") - 1, m_f - F.col("pos_f") - 1)
    )
    # required overlap: I ≥ ⌈t/(1+t)·(m_p+m_f)⌉, cushioned below like plen
    overlap_req = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (m_p + m_f) - F.lit(1e-9)
    )
    # exact suffix lengths (the slice complement): |suf| = m − plen
    suf_min = F.least(
        F.ceil(F.lit(threshold) * m_p - F.lit(1e-9)) - 1,
        F.ceil(F.lit(threshold) * m_f - F.lit(1e-9)) - 1,
    )
    cands = (
        pref.join(full, "h")
        .filter(F.col("id_p") != F.col("id_f"))
        # length filter: size-incompatible pairs can never reach t
        .filter(
            F.least(m_p, m_f).cast("double")
            >= F.lit(threshold) * F.greatest(m_p, m_f)
        )
        .groupBy(
            F.least("id_p", "id_f").alias("id_a"),
            F.greatest("id_p", "id_f").alias("id_b"),
        )
        # dedup + positional/count prunes in ONE shuffle: the tightest
        # bound over a pair's matches must still reach the required overlap
        .agg(
            F.min(overlap_ub).alias("_ub"),
            F.count_distinct(F.col("h")).alias("_c"),
            F.first(suf_min).alias("_suf"),
            F.first(overlap_req).alias("_req"),
        )
        .filter(
            F.least(F.col("_ub"), F.col("_c") + F.col("_suf"))
            >= F.col("_req")
        )
        .select("id_a", "id_b")
    )
    pairs = (
        cands.join(hashed.select(F.col("id").alias("id_a"), F.col("hv").alias("sh_a")), "id_a")
        .join(hashed.select(F.col("id").alias("id_b"), F.col("hv").alias("sh_b")), "id_b")
    )
    return (
        pairs
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "jaccard",
        )
    )


def _components_driver(e: DataFrame, id_name: str = "doc_id") -> DataFrame:
    """Union-find over a COLLECTED edge list: (doc_id, component) with
    component = min reachable id — bit-identical to the iterative
    min-label fixpoint, computed in microseconds instead of ~10 Spark
    jobs.

    Only ever called under an explicit row-count gate (the caller counts
    the materialized edge checkpoint first), so the collect is bounded by
    construction — the near-dup PAIR LIST is answer-sized, not
    corpus-sized, and at bench SFs it is tens of rows. This is the guide
    §8 discipline ("decide with small rows"): the corpus-scale work
    (pair generation) stays distributed; the graph contraction on an
    answer-sized edge list is driver work the same way the repo's sketch
    blobs and boundary samples are. Integer/string labels only — no fp,
    so the result cannot drift from the distributed path.
    """
    rows = e.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    from pyspark.sql import types as T

    node_t = e.schema[0].dataType
    schema = T.StructType(
        [
            T.StructField(id_name, node_t, False),
            T.StructField("component", node_t, False),
        ]
    )
    data = [(x, comp_min[find(x)]) for x in parent]
    # Arrow-batched local relation: the labels are referenced by several
    # downstream actions per query, and the pickled-list path would fork
    # defaultParallelism Python workers on every one (r15, guide §4).
    from ..schema import local_rows_df

    return local_rows_df(e.sparkSession, data, schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    check_every: int = 2,
    driver_max_edges: int | None = 500_000,
) -> DataFrame:
    """Duplicate clusters from a near-dup pair list: (doc_id, component)
    where component = the smallest doc id reachable through pairs.

    Iterative min-label propagation — each round every node takes the min
    of its own label and its neighbors' labels; converges in diameter(G)
    rounds (near-dup clusters are shallow, so typically ≤5). Each round is
    one join + one partial-aggregated groupBy on the (small) edge list, and
    ``localCheckpoint`` truncates the growing lineage so round N doesn't
    re-execute rounds 1..N-1. At web scale swap the one-hop propagation for
    the alternating large-star/small-star doubling of Kiveris et al. — the
    join/agg shapes are identical, only the update rule changes.

    The convergence test is a driver-side ``count`` action — a full extra
    job per check — so it runs only every ``check_every`` rounds (label
    propagation is monotone: extra rounds after convergence are no-op
    fixed-point applications, so the result is unchanged; at most
    ``check_every - 1`` redundant rounds run). ``check_every=1`` restores a
    check per round.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    e = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()  # reused by every round
    )
    # r15 small-graph gate: the checkpoint is materialized, so this count
    # reads cached blocks. Near-dup pair lists are answer-sized; when the
    # whole edge list fits the bound, a driver union-find replaces ~10
    # join/agg/checkpoint jobs with one collect (identical labels — see
    # _components_driver). Pass driver_max_edges=None to force the
    # distributed loop (tests assert parity between the two paths).
    if driver_max_edges is not None and e.count() <= driver_max_edges:
        return _components_driver(e)
    labels = (
        e.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    for i in range(max_iter):
        nbr = e.join(labels, e["dst"] == labels["id"]).select(
            F.col("src").alias("id"), F.col("comp")
        )
        new = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        if (i + 1) % check_every == 0 or i + 1 == max_iter:
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            if changed == 0:
                labels = new
                break
        labels = new
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


def cap_buckets(
    banded: DataFrame, key_cols: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Skew guard for LSH bucket self-joins.

    A bucket of size s produces s² candidate pairs — one pathological key
    (template boilerplate, empty-ish docs) can dominate the whole join at
    corpus scale. Capping drops buckets larger than ``max_bucket_size``
    BEFORE the join (window count over the bucket key — one shuffle on the
    same key the join needs anyway). Documents in a dropped bucket can
    still pair through their other bands, so recall degrades gracefully;
    dedup of a bucket that big is better served by the exact tiers anyway.
    ``None`` disables (the default — small corpora don't need it).
    """
    if max_bucket_size is None:
        return banded
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    return (
        banded.withColumn("_bc", F.count(F.lit(1)).over(w))
        .filter(F.col("_bc") <= max_bucket_size)
        .drop("_bc")
    )


# ---------------------------------------------------------------------------
# Tier 4: MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signature(hash_col: Column, num_perm: int = 32, seed: int = 7) -> Column:
    """MinHash signature as array<bigint> of length ``num_perm``.

    ``hash_col`` must be a *materialized* array<bigint> column of shingle
    hashes in [0, 2^31-1) — pass a real column, not an inline expression:
    the signature references its input once per aggregate step, and an
    inline shingle+hash subtree would otherwise be re-evaluated per
    permutation (a 32× blowup caught by bench).

    One aggregate pass over the hashes: the accumulator is the running
    32-wide minimum, updated per hash with zip_with(least). Permutation
    constants a_i, b_i are Python-computed literals (a·h < 2^62, ANSI-safe).
    """
    p = F.lit(_MERSENNE31)
    ab = minhash_ab(seed, num_perm)
    a_consts = F.array(*[F.lit(a) for a, _ in ab])
    b_consts = F.array(*[F.lit(b) for _, b in ab])

    def step(acc: Column, h: Column) -> Column:
        permuted = F.zip_with(a_consts, b_consts, lambda a, b: F.pmod(a * h + b, p))
        return F.zip_with(acc, permuted, lambda x, y: F.least(x, y))

    return F.aggregate(hash_col, F.array_repeat(p.cast("long"), num_perm), step)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH, verified with exact Jaccard.

    bands=8 × rows=4 over 32 perms ⇒ candidate-capture probability
    1-(1-J^4)^8 (≈0.96 at J=0.6, ≈0.80 at J=0.5). Plan at scale:

    1. signatures: shingle explode → per-doc MIN aggregates (whole-stage
       codegen, map-side partial agg: the shuffle carries one 32-long row
       per doc per partition); the groupBy(id) exchange is reused by the
       banding branch and both verification joins;
    2. band keys: explode to ``bands`` rows/doc, shuffle on
       (band, band_hash) — small keys only;
    3. bucket self-join: bounded by bucket size; AQE skew-split handles
       hot buckets, or cap buckets via a count pre-pass;
    4. verify candidates with exact Jaccard on the shingle-hash arrays.
    """
    if num_perm % bands:
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} "
            "(permutations beyond bands*(num_perm//bands) would be "
            "silently computed then ignored)"
        )
    rows_per_band = num_perm // bands
    # Signature via explode + num_perm codegen'd MIN aggregates (same
    # permutation family as :func:`minhash_signature`, identical values).
    # Compared to the narrow higher-order aggregate (CodegenFallback,
    # interpreted per shingle), the explode path stays in whole-stage
    # codegen, gets map-side partial aggregation (the shuffle carries one
    # 32-long row per doc per partition), and its groupBy(id) exchange is
    # REUSED by the banding branch and both verification joins.
    p = F.lit(_MERSENNE31)
    ab = minhash_ab(seed, num_perm)
    # The exploded shingle-hash rows shuffle ONCE on id (ReuseExchange: both
    # aggregates below hang off this same repartition subtree, so the scan +
    # shingle regex + explode compute once). Splitting the signature MIN-agg
    # from the collect_list verification branch keeps the 32-MIN aggregate in
    # whole-stage codegen — a combined agg is forced to ObjectHashAggregate
    # by collect_list and drags the full shingle arrays through it
    # (VERDICT r01 rec 5).
    #
    # For the reuse to ACTUALLY fire, every consumer must prune the shared
    # subtree to the SAME columns: a round-4 plan audit found that carrying
    # a pre-reduced `hp = pmod(h64, p)` column made the signature branch
    # prune to (id, hp) while collect_list pruned to (id, h64) — canonically
    # different subtrees, so ReuseExchange matched nothing and the corpus
    # was scanned, shingled, and shuffled once per consumer (4x). Reducing
    # h64 mod p INSIDE the MIN aggregates keeps the shared subtree at
    # exactly (id, h64): one scan, one 8-byte-per-row shuffle, reused by
    # every branch (pmod is a codegen'd scalar — recomputing it per
    # permutation is free next to a second corpus scan).
    #
    # Reuse evidence must come from the FINAL adaptive plan only
    # (`executedPlan()` text BEFORE "== Initial Plan =="): the initial-plan
    # section legitimately prints the un-deduplicated tree, and a round-4
    # audit that counted scans across the whole string misread it as 4
    # scans / 0 reuse. Verified: 1 FileScan + 3 ReusedExchange at sf0.001
    # AND sf0.1, and an A/B against a localCheckpoint variant showed no
    # timing difference (tests/test_plans.py::test_minhash_corpus_scanned_once).
    # The explicit isnotnull(id) keeps every consumer's canonical subtree
    # IDENTICAL (r16): the verification joins push IsNotNull(id) below the
    # exchange, while the candidate branch's groupBy pushes nothing — two
    # canonically different subtrees would each scan the corpus. A NULL id
    # can never reach the output on any path (collect_set skips nulls; the
    # join keys rejected them before), so the filter is a no-op on results.
    per = (
        _docs_fanned(df, id_col, text_col)  # parallel shingle pass (r15)
        .filter(F.col("id").isNotNull())
        .select("id", F.explode(word_shingles("_t", n)).alias("s"))
        .select("id", F.xxhash64("s").alias("h64"))
        .repartition(F.col("id"))
    )
    hp = F.pmod(F.col("h64"), p)
    docs = (
        per.groupBy("id")
        .agg(
            *[
                F.min(F.pmod(F.lit(a) * hp + F.lit(b), p)).alias(f"_m{i}")
                for i, (a, b) in enumerate(ab)
            ]
        )
        .select(
            "id",
            F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig"),
        )
    )
    # verification arrays: only candidate ids ever join against this branch
    # verification arrays: only candidate ids ever join against this branch
    hv_docs = per.groupBy("id").agg(F.collect_list("h64").alias("hv64"))

    banded = docs.select(
        "id",
        F.explode(band_key_structs(bands, rows_per_band)).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))
    banded = cap_buckets(banded, ["band", "bhash"], max_bucket_size)

    # ids-only candidates; r16: per-bucket set aggregate + in-row
    # combinations replaces the bucket self-join (see _pairs_from_buckets
    # — identical pair set, one shuffle of the band keys instead of two
    # join-side exchanges + the s²-row pre-filter blow-up).
    cands = _pairs_from_buckets(banded, ["band", "bhash"])
    # hashed-shingle verification (see ngram_jaccard_pairs)
    shs = hv_docs.select("id", F.col("hv64").alias("hv"))
    pairs = (
        cands.join(shs.select(F.col("id").alias("id_a"), F.col("hv").alias("sh_a")), "id_a")
        .join(shs.select(F.col("id").alias("id_b"), F.col("hv").alias("sh_b")), "id_b")
    )
    # same size-ratio pre-filter as ngram_jaccard_pairs (implied by the
    # jaccard threshold, skips the expensive intersect for size-mismatches)
    sa, sb = F.size(F.col("sh_a")), F.size(F.col("sh_b"))
    return (
        pairs.filter(
            F.least(sa, sb).cast("double") >= F.lit(threshold) * F.greatest(sa, sb)
        )
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signature(col: Column | str, seed: int = 11) -> Column:
    """64-bit SimHash packed into a bigint.

    Token hashes vote per bit position; bit b of the signature is 1 when the
    sum of votes is ≥ 0. Expressed as aggregate-over-sequence — still a
    narrow projection.
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.array_distinct(
        F.split(F.regexp_replace(F.lower(c), r"^\s+|\s+\z", ""), r"\s+")
    )
    hashes = F.transform(tokens, lambda t: F.xxhash64(t, F.lit(seed)))

    # Single pass over the token hashes: accumulate a 64-slot ones-count
    # array (bit positions are static Python ints — shiftright requires
    # that), then pack bit b as 1 iff ones[b] ≥ half the tokens.
    def ones_of(h: Column) -> Column:
        return F.array(
            *[
                F.shiftright(h, b).bitwiseAND(F.lit(1).cast("long")).cast("int")
                for b in range(64)
            ]
        )

    ones = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, ones_of(h), lambda a, o: a + o),
    )
    n_tokens = F.size(tokens)
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.element_at(ones, b + 1) * 2 >= n_tokens, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, b))
    return sig


def simhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Per-doc 64-bit SimHash as a DataFrame: (id, sig).

    Same values as :func:`simhash_signature`, different execution: distinct
    tokens explode to rows, and the per-bit vote counts are 64 codegen'd SUM
    aggregates (map-side partial agg; the shuffle carries one 65-long row
    per doc per partition). The per-row higher-order aggregate variant is
    CodegenFallback — interpreted per token × 64 bits — and benches ~3×
    slower on a 54-token-average corpus.
    """
    one = F.lit(1).cast("long")
    per = _docs_fanned(df, id_col, text_col).select(  # parallel tokenize (r15)
        "id",
        F.explode(
            F.array_distinct(
                F.split(
                    F.regexp_replace(F.lower("_t"), r"^\s+|\s+\z", ""), r"\s+"
                )
            )
        ).alias("t"),
    ).select("id", F.xxhash64("t", F.lit(seed)).alias("h"))
    g = per.groupBy("id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(one)).alias(f"_o{b}")
            for b in range(64)
        ],
        F.count(F.lit(1)).alias("_n"),
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"_o{b}") * 2 >= F.col("_n"), one).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, b))
    return g.select("id", sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 11,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash banding + Hamming verification.

    Pigeonhole: with max_hamming < 4 over 4 16-bit bands, every qualifying
    pair must agree on ≥1 band — candidate recall is exactly 1.0, so the
    banding is a pure pruning step. Bands shuffle as small (band, chunk)
    keys.
    """
    # NOTE: the two sides of the band self-join are byte-identical subtrees,
    # so Spark's ReuseExchange computes the signature aggregate once.
    sigs = simhash_signatures_df(df, text_col, id_col, seed)
    # band index is a static Python int (shiftright needs a literal shift)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    banded = cap_buckets(banded, ["band", "chunk"], max_bucket_size)
    left = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk")
    right = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk")
    # Hamming-verify BEFORE the pair-dedup: bit_count is codegen-cheap and
    # runs stream-side inside the join stage, so the dropDuplicates shuffle
    # carries only qualifying pairs (≤4× final) instead of the full banding
    # candidate explosion — the difference between shuffling |result| and
    # |collisions| at skewed chunks.
    return (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents that share any word ``n``-gram with a
    benchmark/eval set — the standard training-data decontamination pass
    (GPT-3 appendix C / PaLM-style n-gram overlap, public heuristics
    independently expressed).

    Returns one row per contaminated corpus document:
    ``(id_col, n_shared_ngrams)`` where ``n_shared_ngrams`` counts the
    document's DISTINCT shingles that occur anywhere in the benchmark.

    Scale: the benchmark side (an eval suite) is tiny relative to a 100 TB
    corpus, so its distinct shingle hashes are broadcast — the corpus never
    shuffles; the only wide op is the final per-doc count, which shuffles
    (id, hash) longs for *matching* shingles only (contamination is rare, so
    this is ~zero). Shingles are compared as xxhash64 values so no text
    leaves the scan stage; a 64-bit collision could at worst over-count one
    shingle (the DuckDB oracle joins on the raw strings — parity at test
    scale doubles as a collision check).
    """
    corpus_h = (
        _docs_fanned(corpus, id_col, text_col)  # parallel shingle pass (r15)
        .select(F.col("id").alias(id_col), F.explode(word_shingles("_t", n)).alias("_s"))
        .select(id_col, F.xxhash64("_s").alias("_h"))
    )
    bench_h = (
        _docs_fanned(benchmark, id_col, text_col)
        .select(F.explode(word_shingles("_t", n)).alias("_s"))
        .select(F.xxhash64("_s").alias("_h"))
        .distinct()
    )
    return (
        corpus_h.join(F.broadcast(bench_h), "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the split hash runs over the near-dup CLUSTER representative
    (connected-components label), not the document id, so every member of
    a duplicate cluster lands in the same split (the public
    "deduplicate across splits" practice — e.g. Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    ``pairs`` is any (doc_a, doc_b) near-dup pair frame (Jaccard, MinHash,
    SimHash, embedding — caller's choice of detector). Singleton documents
    are their own representative. The hash is the same multiplicative
    scheme as the samplers (residue ranges ⇒ disjoint, reproducible).

    Scale: components over the (tiny) pair set, one left join back to the
    corpus on id, then a codegen'd hash projection — the corpus shuffles
    once on id.
    """
    comp = connected_components(pairs)
    if id_col != "doc_id":  # components always emit 'doc_id'
        comp = comp.withColumnRenamed("doc_id", id_col)
    rep = F.coalesce(F.col("component"), F.col(id_col))
    # reduce mod 1000 BEFORE multiplying: (x·c) mod m == ((x mod m)·c) mod m,
    # and the direct product overflows long (ANSI abort) for ids ≥ ~3.47e9 —
    # exactly the 100 TB corpus this targets
    h = F.pmod(F.pmod(rep, F.lit(1000)) * F.lit(2654435761), F.lit(1000))
    split = (
        F.when(h < train_pct * 10, F.lit("train"))
        .when(h < (train_pct + val_pct) * 10, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.join(comp, id_col, "left").select(
        F.col(id_col), rep.cast("long").alias("rep"), split.alias("split")
    )


def shared_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Cross-document boilerplate detection: per document, the fraction of
    its distinct word ``n``-grams that also occur in at least one OTHER
    document (the span-level dup signal behind substring-dedup pipelines —
    Lee et al. 2022 run it at suffix-array granularity; word-8-gram
    granularity is the cheap distributed approximation).

    Returns ``(id_col, n_spans, n_shared_spans, shared_frac)`` per doc —
    feed ``shared_frac`` into a quality gate to drop template-heavy docs
    that whole-document Jaccard misses (they repeat a header, not the body).

    Scale: shingles leave the scan as xxhash64 longs — no text shuffles.
    Two aggregations, both map-side combinable: distinct-doc count per
    shingle hash, then matched-span count per doc. The shared-shingle set
    joins back against the exploded corpus on the hash; duplication is rare
    so AQE turns that into a broadcast at runtime. A corpus-wide template
    shingle inflates its *count row* only (one long), never a join fanout —
    each (doc, shingle) row matches at most one shared row, so there is no
    s² blowup and no skew cap is needed.
    """
    base = (
        _docs_fanned(df, id_col, text_col)  # parallel shingle pass (r15)
        .select("id", word_shingles("_t", n).alias("sh"))
        .repartition(F.col("id"))
    )
    exploded = base.select("id", F.explode("sh").alias("_s")).select(
        "id", F.xxhash64("_s").alias("_h")
    )
    shared = (
        exploded.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_h")
    )
    per_doc = exploded.join(shared, "_h").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shared_spans")
    )
    n_spans = F.size(F.col("sh"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            n_spans.alias("n_spans"),
            F.coalesce(F.col("n_shared_spans"), F.lit(0)).alias("n_shared_spans"),
            F.round(
                F.coalesce(F.col("n_shared_spans"), F.lit(0)).cast("double")
                / n_spans.cast("double"),
                6,
            ).alias("shared_frac"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_blocking: int = 3,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-subset pairs by n-gram containment C(A→B) = |A∩B| / |A|.

    Jaccard misses excerpt/quote relationships: a 50-token doc fully
    contained in a 5000-token doc has J ≈ 0.01 but containment 1.0. Output
    is asymmetric — ``doc_a`` is the (near-)contained document, ``doc_b``
    the container.

    Candidates: A keys on its ``n_blocking`` smallest shingles; B keys on
    ALL its shingles (an inverted index — for high containment, A's
    smallest shingle is in B with probability ≥ threshold, so recall
    degrades gracefully, and the blocking is deterministic so the DuckDB
    oracle replicates it exactly). Scale: the index explode is |shingles|
    rows/doc of (id, short string); posting-list skew (a stopword-only
    shingle) is the same s·|A-side| fanout as LSH buckets —
    ``max_bucket_size`` caps it via :func:`cap_buckets`. Verification
    intersects xxhash64'd arrays, ids-only through the candidate join.
    """
    docs = (
        _docs_fanned(df, id_col, text_col)  # parallel shingle pass (r15)
        .select("id", word_shingles("_t", n).alias("sh"))
        .select(
            "id",
            F.slice(F.array_sort("sh"), 1, n_blocking).alias("bkeys"),
            F.transform("sh", lambda s: F.xxhash64(s)).alias("hv"),
        )
        .repartition(F.col("id"))
    )
    left = docs.select("id", F.explode("bkeys").alias("bkey"))
    index = cap_buckets(
        docs.select("id", F.explode(F.array_distinct(F.col("bkeys")) if False else F.col("bkeys")).alias("bkey")),
        ["bkey"],
        max_bucket_size,
    )
    cands = (
        left.alias("a")
        .join(index.alias("b"), "bkey")
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hashed = docs.select("id", "hv")
    pairs = cands.join(
        hashed.select(F.col("id").alias("id_a"), F.col("hv").alias("sh_a")), "id_a"
    ).join(hashed.select(F.col("id").alias("id_b"), F.col("hv").alias("sh_b")), "id_b")
    sa = F.size(F.col("sh_a")).cast("double")
    # size prefilter: C ≤ min(|A|,|B|)/|A| ⇒ |B| < t·|A| can't pass. Implied
    # by the final filter ⇒ oracle unchanged.
    return (
        pairs.filter(F.size(F.col("sh_b")).cast("double") >= F.lit(threshold) * sa)
        .withColumn(
            "containment",
            F.round(F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / sa, 6),
        )
        .filter(F.col("containment") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "containment")
    )


def fuzzy_levenshtein_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    max_dist: int = 20,
    bucket_width: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Edit-distance near-match pairs: docs in the same language whose
    normalized texts are within ``max_dist`` Levenshtein edits (the
    character-level dedup tier — catches OCR noise and small in-place edits
    that shingle-based tiers score poorly because every touched n-gram
    breaks).

    Blocking is (lang, first token, length bucket): an edit budget of
    ``max_dist`` chars can't change the length by more than ``max_dist``,
    so with ``bucket_width > max_dist`` the index side emits its bucket ±1
    and the band join is LOSSLESS over the length dimension. The
    first-token key is the deliberate recall tradeoff that makes the join
    key selective at corpus scale (an edit inside token 0 escapes this
    tier; the shingle tiers still see it) — without it, (lang, length-band)
    buckets approach corpus size at 100 TB and the s² verify explodes.
    ``max_bucket_size`` additionally caps template-prefix hot keys.

    Verification: ``levenshtein(a, b, threshold)`` — Spark's thresholded
    form runs the banded O(len·threshold) DP and bails early, not the full
    O(len²) matrix. Candidate texts shuffle once on the block key (edit
    distance needs the characters — there is no hash proxy), which is why
    the blocking must be selective *before* the shuffle.
    """
    norm = normalize_text(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("_lang"),
        norm.alias("_t"),
        F.substring_index(norm, " ", 1).alias("_tok0"),
        F.floor(F.length(norm) / F.lit(bucket_width)).alias("_bkt"),
    )
    probe = base.select("id", "_lang", "_t", "_tok0", F.col("_bkt").alias("_jb"))
    index = base.select(
        "id",
        "_lang",
        "_t",
        "_tok0",
        F.explode(
            F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)
        ).alias("_jb"),
    )
    index = cap_buckets(index, ["_lang", "_tok0", "_jb"], max_bucket_size)
    j = (
        probe.alias("a")
        .join(index.alias("b"), ["_lang", "_tok0", "_jb"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.abs(F.length(F.col("a._t")) - F.length(F.col("b._t"))) <= max_dist
        )
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("a._t"), F.col("b._t"), max_dist),
        )
        .filter(F.col("edit_distance") >= 0)
    )
    return j.select(
        F.col("a.id").alias("doc_a"),
        F.col("b.id").alias("doc_b"),
        F.col("edit_distance").cast("long").alias("edit_distance"),
    )


# ---------------------------------------------------------------------------
# Tier 6: duplicated-span statistics (C4/Dolma-style span-level dedup)
# ---------------------------------------------------------------------------


def span_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 10,
) -> DataFrame:
    """Per-document duplicated-span statistics over fixed-size token spans.

    Doc-level dedup misses the common contamination mode where *parts* of a
    document (boilerplate, license headers, templated passages) repeat
    across an otherwise-unique corpus; C4 and Dolma both remove repeated
    spans rather than whole documents for this reason. Each document is cut
    into consecutive ``span_tokens``-word spans (reusing
    :func:`~..chunking.chunk_documents` — codegen slice/posexplode, no HOFs)
    and a span is *duplicated* when its text occurs more than once in the
    corpus (counting multiplicity, so an in-document repeat counts too).

    Returns ``(id_col, n_spans, n_dup_spans, dup_span_ratio)`` — the ratio
    is the downstream filter knob (e.g. drop docs with ratio > 0.5).

    Scale: spans shuffle as 32-char md5 digests, never as span text — the
    chunked corpus shuffles ONCE on the digest via an explicit repartition,
    and both consumers (occurrence-count agg, join back) read that same
    exchange: the count aggregates ``F.count(id)`` rather than ``count(*)``
    (identical for the never-null id) so its subtree prunes to the same
    ``(id, h)`` columns as the join side — otherwise Catalyst prunes the id
    away, the subtrees canonicalize differently, and the corpus is scanned
    and chunked twice (the round-4 MinHash audit pattern). Both join sides
    inherit hashpartitioning(h), so the join itself adds no exchange. The
    final per-doc agg shuffles ``(id, is_dup)`` pairs only. Skew note: a
    corpus-wide template span concentrates its rows in one h-partition; at
    100 TB cap or pre-filter pathological spans upstream (the digest rows
    are 40 bytes, so even a 1e8-occurrence span is a ~4 GB partition —
    spillable, not fatal). md5 (not xxhash64) keeps the operator
    byte-replicable in the DuckDB oracle; collision odds within a corpus
    are ~n²/2¹²⁸.
    """
    from .chunking import chunk_documents

    spans = (
        chunk_documents(
            # parallel normalize+chunk pass on narrow scans (r15)
            _docs_fanned(df, id_col, text_col).withColumnRenamed("id", id_col),
            max_tokens=span_tokens,
            text_col="_t",
            id_col=id_col,
        )
        .select(F.col(id_col), F.md5("chunk_text").alias("h"))
        .repartition(F.col("h"))
    )
    counts = spans.groupBy("h").agg(F.count(F.col(id_col)).alias("occ"))
    return (
        spans.join(counts, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.when(F.col("occ") > 1, True)).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_span_ratio",
            F.round(F.col("n_dup_spans") / F.col("n_spans").cast("double"), 6),
        )
    )


# ---------------------------------------------------------------------------
# Tier 7: incremental dedup (new batch vs historical corpus)
# ---------------------------------------------------------------------------


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    key: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit only new-batch docs that are novel vs the historical corpus
    AND unique within the batch.

    The steady-state lakehouse shape: a full-corpus re-dedup per ingest is
    O(history) every day, while the incremental form is O(batch) against a
    persisted *hash index* — the corpus side reduces to 16-byte md5 digests
    (a distinct projection any engine can maintain incrementally as an
    aggregate table), and the batch anti-joins against it. Returns the
    surviving batch rows as ``(id_col, text_hash, n_copies)`` with
    ``n_copies`` counting the batch-internal multiplicity.

    Scale: the anti-join shuffles digests, never text; with the hash index
    bucketed by digest (``storage.write_bucketed``) the batch side alone
    shuffles. Within-batch dedup reuses the same digest exchange.
    """
    idx = (
        fan_out(corpus.select(F.col(key)))  # parallel normalize+md5 (r15)
        .select(F.md5(normalize_text(key)).alias("text_hash"))
        .distinct()
    )
    hashed = fan_out(batch).withColumn("text_hash", F.md5(normalize_text(key)))
    fresh = hashed.join(idx, "text_hash", "left_anti").drop("text_hash")
    # within-batch dedup IS normalized_dedup — one canonical implementation
    # of the md5(normalize)/min-id/count convention
    return normalized_dedup(fresh, key=key, id_col=id_col).select(
        id_col, "text_hash", "n_copies"
    )


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str = "p_name",
    block_expr: str = "split_part({name}, ' ', -1)",
    max_dist: int = 2,
) -> DataFrame:
    """Typo-level near-duplicate names: distinct name pairs within edit
    distance ``max_dist``, candidates restricted by a blocking key.

    The character-level member of the dedup family (n-gram Jaccard and
    MinHash operate on token sets and miss single-character typos; edit
    distance catches them). A full levenshtein self-join is O(n²·L²) —
    unplannable at scale — so candidates are blocked on a cheap key (here
    the final token; for free text, a phonetic code or length+prefix band)
    and only in-block pairs pay the levenshtein. The block key shuffles as
    a short string; ``levenshtein`` is a codegen JVM builtin.

    Returns (name_a, name_b, dist) with name_a < name_b — every pair
    emitted exactly once, no hash functions, fully SQL-expressible.
    """
    names = (
        df.select(F.col(name_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("block", F.expr(block_expr.format(name="name")))
    )
    right = names.select(F.col("name").alias("name_b"), F.col("block"))
    return (
        names.join(right, "block")
        .filter(F.col("name") < F.col("name_b"))
        .select(
            F.col("name").alias("name_a"),
            "name_b",
            F.levenshtein("name", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    driver_max_edges: int | None = 500_000,
) -> DataFrame:
    """Connected components via alternating large-star/small-star (Kiveris
    et al., "Connected Components in MapReduce and Beyond") — the web-scale
    path :func:`connected_components` defers to.

    Min-label propagation converges in O(diameter) rounds: fine for the
    shallow clusters near-dup graphs produce, quadratic-wall-clock on a
    long-chain pathology (a crawl ring of 10^6 pages = 10^6 rounds). The
    star operations contract paths roughly geometrically, converging in
    O(log² n) rounds on ANY topology, with each round the same edge-list
    join/agg shapes. Output is identical: (doc_id, component) with
    component = min reachable id.

    Round = large-star then small-star over the undirected neighbor list
    (self-loops included so isolated endpoints keep a row):

    * large-star: every neighbor v > u re-links to m(u) = min(N(u) ∪ u);
    * small-star: every neighbor v ≤ u re-links to m(u).

    Both emit (v, m) edges — each round is per-operation one groupBy(u)
    min-agg (map-side combinable) + one join of the edge list to the
    |V|-row min table, then a distinct on compact (node, node) pairs.
    Lineage is cut per round with localCheckpoint. Convergence: the edge
    list is a fixed point when every node's min equals its own partner set
    — checked as "no edge changed", a count over the round's diff.
    """
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    # symmetrize + self-loops: N(u) always contains u so min() is total
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .union(e.select(F.col("u"), F.col("u").alias("v")))
        .union(e.select(F.col("v").alias("u"), F.col("v")))
        .distinct()
        .localCheckpoint()
    )
    # r15 small-graph gate — same contract as connected_components: labels
    # are identical by construction, the star rounds remain the path taken
    # the moment the edge list outgrows the bound (and under
    # driver_max_edges=None, which the parity tests pin).
    if driver_max_edges is not None and e.count() <= driver_max_edges:
        return _components_driver(e)

    def star(edges: DataFrame, large: bool) -> DataFrame:
        mins = edges.groupBy("u").agg(F.min("v").alias("m"))
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        relinked = (
            edges.filter(keep)
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # parent links (u, m) persist so the star stays connected;
        # symmetrize so the next operation's neighbor lists see both ends
        out = relinked.union(mins.select(F.col("u"), F.col("m").alias("v")))
        return (
            out.union(out.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
        )

    for _ in range(max_iter):
        nxt = star(star(e, large=True), large=False).localCheckpoint()
        # fixed point: the symmetric edge multiset is unchanged
        if nxt.exceptAll(e).limit(1).count() == 0 and e.exceptAll(nxt).limit(1).count() == 0:
            e = nxt
            break
        e = nxt
    # at the fixed point every node's neighborhood min IS its component
    return (
        e.groupBy("u")
        .agg(F.min("v").alias("component"))
        .select(F.col("u").alias("doc_id"), "component")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_blocking: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Asymmetric near-duplication: shingle containment C(A→B) = |A∩B|/|A|.

    Jaccard misses the quote/excerpt pattern — a short document wholly
    contained in a long one scores |A|/|B| ≈ 0 — while its containment is
    1.0. Standard in contamination scanning (a benchmark item quoted inside
    a web page) and license-text detection. Same deterministic
    smallest-shingle blocking and plan shape as
    :func:`ngram_jaccard_pairs`: ids-only through the candidate join,
    hashed-shingle arrays join back for the exact intersect; emits both
    directions' containment, keeping pairs where either side ≥ threshold.
    """
    docs = (
        _docs_fanned(df, id_col, text_col)  # parallel shingle pass (r15)
        .select("id", word_shingles("_t", n).alias("sh"))
        .repartition(F.col("id"))
    )
    keyed = docs.select(
        "id", F.explode(F.slice(F.array_sort("sh"), 1, n_blocking)).alias("bkey")
    )
    # r16 note: the _pairs_from_buckets set-aggregate rewrite was measured
    # HERE and reverted — interleaved A/B at sf0.1 under the widened AQE
    # coalescing read 0.703 → 0.831 s (+18%): this operator's keyed
    # explode is the n_blocking-smallest keys only (no inverted index), so
    # the self-join is small and its two SMJ sides parallelize better than
    # the non-codegen ObjectHashAggregate the rewrite trades them for.
    cands = (
        keyed.alias("a")
        .join(keyed.alias("b"), "bkey")
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hashed = docs.select("id", F.transform("sh", lambda s: F.xxhash64(s)).alias("hv"))
    pairs = cands.join(
        hashed.select(F.col("id").alias("id_a"), F.col("hv").alias("sh_a")), "id_a"
    ).join(hashed.select(F.col("id").alias("id_b"), F.col("hv").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    c_a = F.round(inter / F.size("sh_a"), 6)
    c_b = F.round(inter / F.size("sh_b"), 6)
    return (
        pairs.select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
        )
        .filter(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
    )


def lsh_param_sweep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    band_grid: tuple[int, ...] = (4, 8, 16, 32),
    threshold: float = 0.5,
    seed: int = 7,
    sample_fraction: float | None = 0.5,
) -> DataFrame:
    """Band/row tradeoff report for MinHash-LSH: measured recall and
    candidate cost per (bands, rows_per_band) config, against the exact
    Jaccard tier as ground truth — the tuning artifact you produce BEFORE
    committing a 100 TB dedup run to one parameter choice.

    One row per config:

    ``(bands, rows_per_band, expected_recall_at_t, n_candidates,
    n_captured, n_true, recall, precision)``

    - ``expected_recall_at_t`` = 1-(1-t^r)^b, the S-curve capture
      probability AT the threshold (pairs above t capture more often);
    - ``n_true`` / ``recall``: in sampled mode (``sample_fraction`` set
      — the default) the ground truth is :func:`exhaustive_jaccard_pairs`,
      the prefix-filtered EXHAUSTIVE exact tier (recall 1 by
      construction), so the reported recall is ABSOLUTE — affordable
      precisely because the sweep runs on a bounded sample. Only the
      explicit full-corpus opt-in (``sample_fraction=None``) falls back
      to :func:`ngram_jaccard_pairs`' 3-smallest-shingle blocking, where
      ``n_true`` can undercount true J≥t pairs and recall is measured
      RELATIVE to the blocking-recalled tier;
    - ``precision`` = share of a config's candidate pairs that verify at
      the threshold — the wasted-verification cost signal. Every config
      gets its row even with zero candidates (n_candidates=0,
      precision NULL); recall is NULL only on a truth-free sample.

    Parameter tuning is a sampled activity by contract — the exact truth
    tier is O(corpus blocking join), so tuning runs on a bounded sample,
    picks the knee of the recall/cost curve, then the CHOSEN config runs
    at full scale. ``sample_fraction`` (default 0.5) makes that contract
    executable: a deterministic multiplicative-hash filter on ``id_col``
    (the q_token_budget_sample idiom, xxhash64-prefixed so any id type
    works) keeps ~that fraction of documents BEFORE the shingle explode,
    so every downstream tier — signatures, banding, truth — sees only the
    sample. Pass ``sample_fraction=None`` to opt in to the full corpus
    (small corpora, tests, or when the truth tier is affordable).

    Scale: signatures are computed ONCE (same explode + per-permutation
    MIN aggregates as :func:`minhash_lsh_pairs`, whole-stage codegen, one
    reused groupBy(id) exchange); each config re-slices the SAME signature
    array into band keys, and all configs' band keys union into ONE
    shuffle on (bands, band, bhash). The 1-row truth-count frame joins
    back via broadcast.
    """
    if any(num_perm % b for b in band_grid):
        raise ValueError(f"every bands value in {band_grid} must divide {num_perm}")
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1]: {sample_fraction}")
        if sample_fraction < 1.0:
            # deterministic hash-sample BELOW the shingle explode (plan-
            # guarded in tests/test_plans.py): cheap codegen filter adjacent
            # to the scan, identical doc subset in every tier and every run
            df = df.filter(
                F.pmod(
                    F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_003))
                    * F.lit(2654435761),
                    F.lit(1_000_003),
                )
                < F.lit(int(sample_fraction * 1_000_003))
            )
    p = F.lit(_MERSENNE31)
    ab = minhash_ab(seed, num_perm)
    # r15 restructure (guide §1.2/§2.4): ONE materialized shingle+hash
    # pass feeds every tier. The signature branch and the truth tier live
    # in separately COMPILED plans (the localCheckpoint boundaries below),
    # where ReuseExchange cannot share a subtree — a stage profile showed
    # the corpus shingle regex pass (the sweep's dominant per-row cost)
    # executing 3x per run. Both tiers consume the identical xxhash64
    # shingle hashes, so one checkpointed (id, sorted hv) frame serves
    # the per-permutation MIN aggregates (order-insensitive), the
    # prefix-filter slices (need the sort), and the verification arrays.
    # Values are unchanged: same hashes, same MIN results, same truth
    # pairs (pinned by the oracle at 3 SFs and the exhaustive-tier
    # bruteforce test).
    # eager=True (r16): both tier threads below read this frame — the lazy
    # variant would let two concurrent first-actions race to compute the
    # same partitions (duplicate shingle work); materializing once up
    # front costs the same job the first consumer paid anyway.
    hashed = (
        _docs_fanned(df, id_col, text_col)  # parallel shingle pass (r15)
        .select(
            "id",
            F.array_sort(
                F.transform(word_shingles("_t", n), lambda s: F.xxhash64(s))
            ).alias("hv"),
        )
        .localCheckpoint(eager=True)
    )

    def build_sig() -> DataFrame:
        per = hashed.select("id", F.explode("hv").alias("h64"))
        hp = F.pmod(F.col("h64"), p)
        return (
            per.groupBy("id")
            .agg(
                *[
                    F.min(F.pmod(F.lit(a) * hp + F.lit(b), p)).alias(f"_m{i}")
                    for i, (a, b) in enumerate(ab)
                ]
            )
            .select(
                "id",
                F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig"),
            )
            # every config's band explode re-slices this one frame — the
            # lazy checkpoint materializes the signature pass ONCE (|docs|
            # rows of 32 longs, far smaller than the shingled corpus)
            # instead of letting the consumer subtrees re-scan the corpus
            .localCheckpoint(eager=False)
        )

    def build_truth() -> DataFrame:
        # sampled mode (the contract default): absolute ground truth from
        # the exhaustive prefix-filtered tier, fed from the SAME
        # checkpointed hash frame as the signatures (r15 — no second
        # corpus pass); full-corpus opt-in keeps the near-linear blocking
        # heuristic (documented relative recall), which needs the string
        # shingles for its lexicographic blocking keys and so derives its
        # own pass. Known cost of that opt-in (ADVICE r15): the corpus is
        # shingled twice — once for `hashed` above, once inside
        # ngram_jaccard_pairs, whose one-frame checkpoint bundles the
        # string blocking keys WITH its hash arrays. Removing the second
        # pass would mean teaching ngram_jaccard_pairs to accept a
        # precomputed hash frame; not worth the API split for an explicit
        # opt-in path no registered query takes.
        truth_src = (
            _exhaustive_pairs_from_hashed(hashed, threshold)
            if sample_fraction is not None
            else ngram_jaccard_pairs(
                df, text_col=text_col, id_col=id_col, n=n, threshold=threshold
            )
        )
        return (
            truth_src.select(
                F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
            )
            # two consumers (capture join + 1-row count): materialize the
            # pair-set-sized truth tier once instead of re-running its
            # blocking join per consumer
            .localCheckpoint(eager=False)
        )

    # r16 (guide §2.6 overlap independent jobs): each tier's checkpoint
    # construction eagerly runs its AQE shuffle-stage jobs, and the two
    # tiers are independent once `hashed` is materialized — built
    # sequentially they serialize ~all of the sweep's heavy jobs, so the
    # signature aggregate's stage tails left the cluster idle while the
    # truth tier waited. Two driver threads submit them concurrently
    # (InheritableThread so JVM thread-local job properties inherit); the
    # DataFrames they return are composed into one final plan exactly as
    # before, so the result is unchanged.
    from pyspark import InheritableThread

    tier_out: dict = {}
    tier_err: dict = {}

    def _run_tier(key: str, fn) -> None:
        try:
            tier_out[key] = fn()
        except BaseException as e:  # re-raised on the caller thread below
            tier_err[key] = e

    threads = [
        InheritableThread(target=_run_tier, args=("sig", build_sig)),
        InheritableThread(target=_run_tier, args=("truth", build_truth)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in tier_err.values():
        raise e
    docs_sig, truth = tier_out["sig"], tier_out["truth"]

    def banded_for(bands: int) -> DataFrame:
        return docs_sig.select(
            F.lit(bands).alias("bands"),
            "id",
            F.explode(band_key_structs(bands, num_perm // bands)).alias("bk"),
        ).select(
            "bands", "id", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash")
        )

    banded = banded_for(band_grid[0])
    for b in band_grid[1:]:
        banded = banded.unionByName(banded_for(b))
    # r16: per-bucket set aggregate + in-row combinations replaces the
    # bucket self-join (see _pairs_from_buckets — identical pair set per
    # config; "bands" rides along as the carry/group column).
    cands = _pairs_from_buckets(
        banded, ["bands", "band", "bhash"], carry=["bands"]
    )
    per_cfg = (
        cands.join(truth.withColumn("_hit", F.lit(1)), ["id_a", "id_b"], "left")
        .groupBy("bands")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_captured"),
        )
    )
    # a config with ZERO candidate pairs (selective bands on a
    # low-duplication sample — the sweep's stated use case) has no group
    # above; left-join from the config grid so the report still carries
    # its row with n_candidates=0 / recall=0 (precision NULL: undefined
    # over an empty candidate set) instead of silently omitting it
    # (r06 review finding: the one-row-per-config contract)
    cfgs = banded.select("bands").distinct()
    per_cfg = cfgs.join(per_cfg, "bands", "left").select(
        "bands",
        F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce("n_captured", F.lit(0)).cast("long").alias("n_captured"),
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    expected = F.create_map(
        *[
            c
            for b in band_grid
            for c in (
                F.lit(b),
                F.lit(round(1 - (1 - threshold ** (num_perm // b)) ** b, 6)),
            )
        ]
    )
    return (
        per_cfg.join(F.broadcast(n_true))
        .select(
            "bands",
            (F.lit(num_perm) / F.col("bands")).cast("int").alias("rows_per_band"),
            expected[F.col("bands")].alias("expected_recall_at_t"),
            "n_candidates",
            "n_captured",
            "n_true",
            # NULL (not an ANSI divide-by-zero abort) when the denominator
            # set is empty: recall is undefined on a truth-free sample,
            # precision on a candidate-free config
            F.when(
                F.col("n_true") > 0,
                F.round(F.col("n_captured") / F.col("n_true"), 6),
            ).alias("recall"),
            F.when(
                F.col("n_candidates") > 0,
                F.round(F.col("n_captured") / F.col("n_candidates"), 6),
            ).alias("precision"),
        )
        .orderBy("bands")
    )
