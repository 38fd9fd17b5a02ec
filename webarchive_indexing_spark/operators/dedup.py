"""Deduplication family (SURVEY.md §2.11 L1/L2/L4) — exact, MinHash,
SimHash, n-gram Jaccard.  All formulated as DataFrame pipelines whose
shuffles are the theoretical minimum for each algorithm; Python never
touches a row.

Scale notes (100 TB):
* exact: one hash-groupBy shuffle on a 16-byte key (not the payload).
* minhash signatures: embarrassingly parallel map (no shuffle).
* LSH candidate pairs: shuffle keyed on (band, band-signature) — the
  standard banding trade-off; bucket sizes bound the join fan-out, and
  AQE's skew split handles hot buckets.
* simhash: map-side per-doc agg after one explode; grouped by doc id.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, token_hash, tokens

#: MinHash permutation constants: sig_j = min((A_j * h + B_j) mod P).
P = 2_147_483_647  # 2^31 - 1 (prime)
A = [1_299_721, 1_800_451, 2_654_435, 1_103_515, 1_234_577, 2_027_651, 1_572_869, 1_949_381]
B = [12_345, 67_891, 424_243, 987_653, 13_466_917, 21_701, 86_243, 110_503]


def minhash_signature(sh: Column, n_perm: int = 4) -> list[Column]:
    """n_perm min-hash values over a shingle array column (NULL when
    the doc has no shingles).

    NOTE: each returned column re-applies ``token_hash`` to the whole
    array — codegen subexpression elimination skips higher-order
    functions, so inlining these n_perm columns into one projection
    pays the md5 n_perm times.  On a hot path, project
    ``transform(sh, token_hash)`` into its own column first and run
    the permutations over the pre-hashed array (see
    queries.llm.dedup_minhash_signatures / minhash_lsh_pairs)."""
    h = lambda s: token_hash(s)  # noqa: E731
    return [
        F.array_min(
            F.transform(sh, lambda s: (F.lit(A[j]) * h(s) + F.lit(B[j])) % F.lit(P))
        ).alias(f"sig_{j}")
        for j in range(n_perm)
    ]


def sql_minhash_sig(shingles_expr: str, j: int) -> str:
    from ..functions.text import sql_token_hash

    return (
        f"list_aggregate(list_transform({shingles_expr}, "
        f"s -> ({A[j]} * {sql_token_hash('s')} + {B[j]}) % {P}), 'min')"
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """L1 exact dedup: md5-groupBy, keep the lowest id (deterministic
    survivor), count the group.  The shuffle key is the digest, so the
    payload never re-shuffles."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash per document: per-bit signed vote over token
    hashes, bit set where the vote is positive.

    The token hash is projected ONCE before the aggregate — referencing
    ``token_hash(tok)`` inside each of the 16 vote expressions would
    evaluate the md5 16x per row (aggregate expressions share no
    subexpression elimination), the same hidden-cost class the scale
    sniff caught in the minhash signatures."""
    tok = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok")).select(
        id_col, token_hash(F.col("tok")).alias("h")
    )
    h = F.col("h")
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{k}")
            for k in range(16)
        ]
    )
    bits = [F.when(F.col(f"v{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0)) for k in range(16)]
    simhash = functools.reduce(lambda a, b: a + b, bits).cast("bigint")
    return votes.select(id_col, simhash.alias("simhash"))


def sql_simhash16(id_col: str = "doc_id", base: str = "base") -> str:
    """DuckDB twin of simhash16 over a CTE ``base(id, text)``."""
    from ..functions.text import sql_token_hash

    h = sql_token_hash("tok")
    votes = ", ".join(
        f"SUM(CASE WHEN ({h} >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}"
        for k in range(16)
    )
    bits = " + ".join(f"(CASE WHEN v{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(16))
    return f"""
    SELECT {id_col}, CAST({bits} AS BIGINT) AS simhash FROM (
      SELECT {id_col}, {votes}
      FROM (SELECT {id_col}, unnest(string_split(text, ' ')) AS tok FROM {base})
      GROUP BY {id_col}
    )
    """


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """L2 near-dup pairs via MinHash banding.

    signatures (map-only) → band keys → shuffle on (band, key) →
    within-bucket pairs → exact shingle-Jaccard verification (the
    standard filter-verify shape).  Returns (a_id, b_id, jaccard).

    Shuffle payload: the banding self-join carries ONLY (id, band, key)
    — never shingle arrays — so the exchange size is independent of
    document length.  Verification re-attaches the 8-byte hashed
    shingle sets by id afterwards (one id-keyed join per side over the
    deduplicated candidate pairs), the same payload discipline as the
    ngram_jaccard path.  Hashed sets make Jaccard collision-tolerant to
    ~2^-32, identical on both engines."""
    r = n_perm // bands
    sh = F.array_distinct(F.transform(shingles(tokens(F.col(text_col))), token_hash))
    docs = df.select(F.col(id_col).alias("id"), sh.alias("sh")).filter(F.size("sh") > 0)
    # the signature path and BOTH verification joins consume `docs`;
    # the three subtrees differ enough that ReuseExchange won't fire,
    # so without this the CPU-heavy tokenize→shingle→hash explode runs
    # three times.  localCheckpoint (not persist: its blocks are
    # ContextCleaner-reclaimed when the DataFrame is GC'd, cache-
    # manager entries are not) computes it once; eager=False defers to
    # the first action so building the plan stays free.
    docs = docs.localCheckpoint(eager=False)
    # minhash over the pre-hashed shingles: identical values to
    # minhash_signature over the raw strings (token_hash is applied
    # exactly once either way; min is duplicate-insensitive).
    sigs = docs.select(
        "id",
        *[
            F.array_min(
                F.transform(F.col("sh"), lambda s: (F.lit(A[j]) * s + F.lit(B[j])) % F.lit(P))
            ).alias(f"sig_{j}")
            for j in range(n_perm)
        ],
    )

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[F.col(f"sig_{b * r + i}") for i in range(r)]).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    verif = cand.join(
        docs.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh")), "a_id"
    ).join(docs.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh")), "b_id")
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh")))
    union = F.size("a_sh") + F.size("b_sh") - inter
    jac = inter.cast("double") / union
    return (
        verif.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )
