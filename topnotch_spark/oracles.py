"""DuckDB oracle-SQL generators for the extension operators.

Each generator mirrors, expression for expression, the Spark-side builders
in functions/text.py, functions/vectors.py and the operators built on them
— same md5-derived hashing, same token model, same fold order — so results
match the Spark output bit-for-bit. The SQL is verbose (e.g. 32 per-bit
simhash expressions) because it is *generated*, not hand-maintained.
"""

from __future__ import annotations

# ---- text building blocks (mirror functions/text.py) ----------------------

TOKENS = (
    "list_filter(regexp_split_to_array(lower(trim({col})), '\\s+'), t -> t <> '')"
)


def tokens(col: str = "text") -> str:
    return TOKENS.format(col=col)


def shingles(col: str = "text", n: int = 3) -> str:
    """Distinct word n-gram shingles; 1-based list indexing in DuckDB."""
    parts = " || ' ' || ".join(f"__t__[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"CASE WHEN len(__t__) >= {n} THEN generate_series(1, len(__t__) - {n - 1}) "
        f"ELSE [] END, i -> {parts}))"
    )


def sorted_token_fingerprint() -> str:
    return "md5(array_to_string(list_sort(list_distinct(__t__)), ' '))"


def nibble(hexstr: str, pos_1based: str) -> str:
    return f"(strpos('0123456789abcdef', substr({hexstr}, {pos_1based}, 1)) - 1)"


def md5_bit(hexstr: str, bit: int) -> str:
    pos = bit // 4 + 1
    shift = 3 - (bit % 4)
    return f"(CAST(floor({nibble(hexstr, str(pos))} / {2 ** shift}) AS INTEGER) % 2)"


def simhash_expr(bits: int = 32) -> str:
    """SimHash bit-string over __dt__ (distinct tokens list)."""
    bit_exprs = []
    for b in range(bits):
        votes = (
            f"coalesce(list_sum(list_transform(__dt__, "
            f"t -> {md5_bit('md5(t)', b)} * 2 - 1)), 0)"
        )
        bit_exprs.append(f"CASE WHEN {votes} > 0 THEN '1' ELSE '0' END")
    return " || ".join(bit_exprs)


def minhash_component(h: int, num_hashes: int) -> str:
    """Affine minhash component mirroring operators/dedup.py: one md5 per
    shingle → 60-bit int mod P, then (a_h * H + b_h) mod P, min over
    shingles. DuckDB parses hex via '0x…'::BIGINT; Spark uses conv()."""
    from topnotch_spark.operators.dedup import MINHASH_P, minhash_coeffs

    a, b = minhash_coeffs(num_hashes)
    hp = f"(('0x' || substr(md5(s), 1, 15))::BIGINT % {MINHASH_P})"
    return (
        f"coalesce(list_min(list_transform(__sh__, "
        f"s -> ({a[h]} * {hp} + {b[h]}) % {MINHASH_P})), {MINHASH_P})"
    )


# ---- vector building blocks (mirror functions/vectors.py) -----------------

def dot(a: str, b: str, dim: int) -> str:
    return (
        f"coalesce(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), 0.0)"
    )


def cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({dot(a, b, dim)} / "
        f"(sqrt({dot(a, a, dim)}) * sqrt({dot(b, b, dim)})))"
    )


def srp_bucket(vec: str, dim: int, n_planes: int = 8) -> str:
    bit_exprs = []
    for p in range(n_planes):
        plane_hash = f"md5('p{p}_d' || (i - 1))"
        sign = (
            f"CASE WHEN {nibble(plane_hash, '1')} >= 8 "
            f"THEN 1.0 ELSE -1.0 END"
        )
        proj = (
            f"coalesce(list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> {vec}[i]::DOUBLE * {sign})), 0.0)"
        )
        bit_exprs.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bit_exprs)


# ---- full oracle queries ---------------------------------------------------

_DOC_BASE = f"""
    WITH toked AS (
      SELECT doc_id, text, {tokens()} AS __t__ FROM documents
    )
"""


def lsh_tuning_sql(
    num_hashes: int = 16,
    threshold: float = 0.5,
    probe_delta: float = 0.1,
    round_digits: int = 6,
) -> str:
    """Mirror of dedup.lsh_tuning: the same factorizations and
    closed-form S-curve expressions over literals."""
    facts = ", ".join(
        f"({b}, {num_hashes // b})"
        for b in range(1, num_hashes + 1)
        if num_hashes % b == 0
    )
    t = repr(float(threshold))
    lo = repr(max(threshold - probe_delta, 0.0))
    hi = repr(min(threshold + probe_delta, 1.0))

    def p_at(s: str) -> str:
        return (
            f"1.0 - power(1.0 - power({s}, rows_per_band), bands)"
        )

    return f"""
        SELECT bands, rows_per_band,
               round({p_at(t)}, {round_digits}) AS p_at_t,
               round({p_at(lo)}, {round_digits}) AS p_below,
               round({p_at(hi)}, {round_digits}) AS p_above,
               round(power(1.0 / bands, 1.0 / rows_per_band),
                     {round_digits}) AS s_half
        FROM (VALUES {facts}) AS t(bands, rows_per_band)
    """


def dedup_exact_sql() -> str:
    return """
        SELECT doc_id,
               md5(text) AS dup_key,
               count(*) OVER (PARTITION BY md5(text)) AS group_size,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM documents
    """


def dedup_fingerprint_sql() -> str:
    return f"""
        {_DOC_BASE},
        keyed AS (
          SELECT doc_id, {sorted_token_fingerprint()} AS dup_key FROM toked
        )
        SELECT doc_id, dup_key,
               count(*) OVER (PARTITION BY dup_key) AS group_size,
               doc_id = min(doc_id) OVER (PARTITION BY dup_key) AS keep
        FROM keyed
    """


def dedup_minhash_sql(
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.5, shingle_n: int = 3
) -> str:
    rows_per_band = num_hashes // bands
    sig_cols = ",\n               ".join(
        f"{minhash_component(h, num_hashes)} AS sig_{h}" for h in range(num_hashes)
    )
    band_cols = ",\n               ".join(
        "md5("
        + " || '|' || ".join(
            f"sig_{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
        )
        + f") AS band_{b}"
        for b in range(bands)
    )
    band_union = "\n          UNION ALL ".join(
        f"SELECT id, {b} AS band_idx, band_{b} AS bucket FROM banded"
        for b in range(bands)
    )
    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (
          SELECT id, __sh__ FROM shingled WHERE len(__sh__) > 0
        ),
        sigs AS (
          SELECT id, {sig_cols} FROM base
        ),
        banded AS (
          SELECT id, {band_cols} FROM sigs
        ),
        buckets AS (
          {band_union}
        ),
        candidates AS (
          SELECT DISTINCT a.id AS id_1, b.id AS id_2
          FROM buckets a JOIN buckets b
            ON a.band_idx = b.band_idx AND a.bucket = b.bucket
          WHERE a.id < b.id
        )
        SELECT c.id_1, c.id_2,
               CASE WHEN len(list_distinct(s1.__sh__ || s2.__sh__)) > 0
                    THEN len(list_intersect(s1.__sh__, s2.__sh__)) * 1.0
                         / len(list_distinct(s1.__sh__ || s2.__sh__))
                    ELSE 0.0 END AS jaccard
        FROM candidates c
        JOIN base s1 ON c.id_1 = s1.id
        JOIN base s2 ON c.id_2 = s2.id
        WHERE CASE WHEN len(list_distinct(s1.__sh__ || s2.__sh__)) > 0
                   THEN len(list_intersect(s1.__sh__, s2.__sh__)) * 1.0
                        / len(list_distinct(s1.__sh__ || s2.__sh__))
                   ELSE 0.0 END >= {threshold}
    """


def dedup_incremental_minhash_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> str:
    """Mirror of catalog.dedup_incremental_minhash: the dedup_minhash
    signature/banding CTEs split into index (even ids) and batch (odd
    ids) sides, candidates from the bucket join, scored with the
    signature-estimated Jaccard — an unrolled sum of exact integer
    component equalities over 16.0 (a dyadic ratio, identical IEEE on
    both engines) — best match by (estimate desc, index id asc)."""
    rows_per_band = num_hashes // bands
    sig_cols = ",\n               ".join(
        f"{minhash_component(h, num_hashes)} AS sig_{h}"
        for h in range(num_hashes)
    )
    band_cols = ",\n               ".join(
        "md5("
        + " || '|' || ".join(
            f"sig_{b * rows_per_band + r}::VARCHAR"
            for r in range(rows_per_band)
        )
        + f") AS band_{b}"
        for b in range(bands)
    )
    band_union = "\n          UNION ALL ".join(
        f"SELECT id, {b} AS band_idx, band_{b} AS bucket FROM banded"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sb.sig_{h} = si.sig_{h} THEN 1 ELSE 0 END)"
        for h in range(num_hashes)
    )
    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (
          SELECT id, __sh__ FROM shingled WHERE len(__sh__) > 0
        ),
        sigs AS (
          SELECT id, {sig_cols} FROM base
        ),
        banded AS (
          SELECT id, {band_cols} FROM sigs
        ),
        buckets AS (
          {band_union}
        ),
        cand AS (
          SELECT DISTINCT b.id AS bid, i.id AS iid
          FROM buckets b JOIN buckets i
            ON b.band_idx = i.band_idx AND b.bucket = i.bucket
          WHERE b.id % 2 = 1 AND i.id % 2 = 0
        ),
        scored AS (
          SELECT c.bid, c.iid,
                 round(({agree}) / {float(num_hashes)}, 6) AS est
          FROM cand c
          JOIN sigs sb ON sb.id = c.bid
          JOIN sigs si ON si.id = c.iid
        ),
        per AS (
          SELECT bid,
                 CAST(count(*) AS BIGINT) AS n_candidates,
                 max(CASE WHEN rn = 1 THEN iid END) AS best_match_id,
                 max(CASE WHEN rn = 1 THEN est END) AS best_est_jaccard
          FROM (
            SELECT bid, iid, est,
                   row_number() OVER (
                     PARTITION BY bid ORDER BY est DESC, iid ASC
                   ) AS rn
            FROM scored
          ) GROUP BY bid
        )
        SELECT d.doc_id,
               coalesce(per.n_candidates, 0) AS n_candidates,
               per.best_match_id,
               per.best_est_jaccard,
               (coalesce(per.best_est_jaccard, 0.0) < {threshold})
                 AS keep
        FROM documents d LEFT JOIN per ON d.doc_id = per.bid
        WHERE d.doc_id % 2 = 1
    """


def dedup_minhash_compaction_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> str:
    """Mirror of catalog.dedup_minhash_compaction: the shared
    signature/banding CTEs, then the three round-ordered accept sets
    replayed in SQL — idx0 = the %3==0 seed; per round the rejected
    batch ids are those with any bucket-collision candidate in the
    index-so-far whose signature-estimated Jaccard (exact integer
    component agreements / num_hashes, rounded like the Spark side)
    reaches the threshold; accepted ids' bucket rows join the final
    index. Docs with no shingles never enter the index on either
    engine (they have no signature rows)."""
    rows_per_band = num_hashes // bands
    sig_cols = ",\n               ".join(
        f"{minhash_component(h, num_hashes)} AS sig_{h}"
        for h in range(num_hashes)
    )
    band_cols = ",\n               ".join(
        "md5("
        + " || '|' || ".join(
            f"sig_{b * rows_per_band + r}::VARCHAR"
            for r in range(rows_per_band)
        )
        + f") AS band_{b}"
        for b in range(bands)
    )
    band_union = "\n          UNION ALL ".join(
        f"SELECT id, {b} AS band_idx, band_{b} AS bucket FROM banded"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sb.sig_{h} = si.sig_{h} THEN 1 ELSE 0 END)"
        for h in range(num_hashes)
    )
    est = f"round(({agree}) / {float(num_hashes)}, 6)"
    sig_digest = (
        "md5("
        + " || '|' || ".join(
            f"s.sig_{h}::VARCHAR" for h in range(num_hashes)
        )
        + ")"
    )

    def rej(round_mod: int, idx: str) -> str:
        return f"""
          SELECT DISTINCT b.id FROM buckets b
          JOIN buckets i
            ON b.band_idx = i.band_idx AND b.bucket = i.bucket
          JOIN {idx} ON i.id = {idx}.id
          JOIN sigs sb ON sb.id = b.id
          JOIN sigs si ON si.id = i.id
          WHERE b.id % 3 = {round_mod} AND {est} >= {threshold}
        """

    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (
          SELECT id, __sh__ FROM shingled WHERE len(__sh__) > 0
        ),
        sigs AS (
          SELECT id, {sig_cols} FROM base
        ),
        banded AS (
          SELECT id, {band_cols} FROM sigs
        ),
        buckets AS (
          {band_union}
        ),
        idx0 AS (SELECT id FROM base WHERE id % 3 = 0),
        rej1 AS ({rej(1, "idx0")}),
        idx1 AS (
          SELECT id FROM idx0
          UNION
          SELECT id FROM base WHERE id % 3 = 1
            AND id NOT IN (SELECT id FROM rej1)
        ),
        rej2 AS ({rej(2, "idx1")}),
        idx2 AS (
          SELECT id FROM idx1
          UNION
          SELECT id FROM base WHERE id % 3 = 2
            AND id NOT IN (SELECT id FROM rej2)
        )
        SELECT bk.id AS index_id, bk.band_idx, bk.bucket,
               {sig_digest} AS sig_digest
        FROM buckets bk
        JOIN sigs s ON s.id = bk.id
        JOIN idx2 ON bk.id = idx2.id
    """


def cross_source_dup_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    source_col: str = "source",
) -> str:
    """Mirror of dedup.cross_source_dup_matrix: the full minhash pair
    SQL nested as a CTE, two id joins to the (id, source) projection,
    symmetric least/greatest rollup."""
    pair_sql = dedup_minhash_sql(
        num_hashes=num_hashes, bands=bands,
        threshold=threshold, shingle_n=shingle_n,
    )
    return f"""
        WITH pairs AS ({pair_sql}),
        src AS (SELECT doc_id AS id, {source_col} AS src FROM documents)
        SELECT least(a.src, b.src) AS source_x,
               greatest(a.src, b.src) AS source_y,
               count(*) AS n_pairs,
               least(a.src, b.src) = greatest(a.src, b.src)
                 AS within_source
        FROM pairs p
        JOIN src a ON p.id_1 = a.id
        JOIN src b ON p.id_2 = b.id
        GROUP BY 1, 2
        ORDER BY n_pairs DESC, source_x, source_y
    """


def dedup_clusters_sql(
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.5, shingle_n: int = 3
) -> str:
    """Connected components over the minhash pair graph, as a recursive
    CTE: ``walk`` enumerates (node, origin) for every origin that can
    reach the node; min(origin) per node = component min id. Mirrors
    operators/cluster.py min-label propagation exactly."""
    pairs = dedup_minhash_sql(num_hashes, bands, threshold, shingle_n)
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT id_1, id_2 FROM ({pairs})
        ),
        edges AS (
          SELECT id_1 AS a, id_2 AS b FROM pairs
          UNION
          SELECT id_2, id_1 FROM pairs
        ),
        walk(id, comp) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, w.comp FROM walk w JOIN edges e ON w.id = e.a
        ),
        comps AS (
          SELECT id, min(comp) AS cluster_id FROM walk GROUP BY id
        )
        SELECT id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               id = cluster_id AS keep
        FROM comps
    """


def cluster_safe_split_sql(
    fractions: dict[str, float],
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 5,
    salt: str = "csplit",
) -> str:
    """Mirror of curation.cluster_safe_split: the minhash pair graph's
    components (recursive walk, min origin) key the split hash;
    unclustered docs key by their own id. Same cumulative-threshold
    CASE as hash_split_sql."""
    from topnotch_spark.operators.curation import _rate_threshold_hex

    pairs = dedup_minhash_sql(num_hashes, bands, threshold, shingle_n)
    key = f"substr(md5('{salt}:' || CAST(group_key AS VARCHAR)), 1, 8)"
    names = list(fractions)
    cum = 0.0
    cases = []
    for name, frac in list(fractions.items())[:-1]:
        cum += frac
        thr = _rate_threshold_hex(min(cum, 1.0))
        cases.append(f"WHEN {key} < '{thr}' THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT id_1, id_2 FROM ({pairs})
        ),
        edges AS (
          SELECT id_1 AS a, id_2 AS b FROM pairs
          UNION
          SELECT id_2, id_1 FROM pairs
        ),
        walk(id, comp) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, w.comp FROM walk w JOIN edges e ON w.id = e.a
        ),
        comps AS (
          SELECT id, min(comp) AS comp FROM walk GROUP BY id
        ),
        keyed AS (
          SELECT d.doc_id,
                 coalesce(c.comp, d.doc_id) AS group_key
          FROM documents d LEFT JOIN comps c ON d.doc_id = c.id
        )
        SELECT doc_id, group_key, {case} AS split FROM keyed
    """


def dedup_keep_best_sql(
    stopwords: list[str],
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> str:
    """Components + highest-quality-keeper: mirrors
    cluster.keep_best_in_cluster fed by textqc.quality_scores."""
    pairs = dedup_minhash_sql(num_hashes, bands, threshold, shingle_n)
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT id_1, id_2 FROM ({pairs})
        ),
        edges AS (
          SELECT id_1 AS a, id_2 AS b FROM pairs
          UNION
          SELECT id_2, id_1 FROM pairs
        ),
        walk(id, comp) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.b, w.comp FROM walk w JOIN edges e ON w.id = e.a
        ),
        comps AS (
          SELECT id, min(comp) AS cluster_id FROM walk GROUP BY id
        ),
        quality AS (
          SELECT doc_id, quality_score FROM ({text_quality_sql(stopwords)})
        ),
        scored AS (
          -- LEFT join: keep_best_in_cluster keeps unscored cluster
          -- members (NULL score, ranked last) — an unscored doc must
          -- never silently vanish from a dedup report
          SELECT c.id, c.cluster_id, q.quality_score
          FROM comps c LEFT JOIN quality q ON c.id = q.doc_id
        )
        SELECT id, cluster_id, quality_score,
               row_number() OVER (
                 PARTITION BY cluster_id
                 ORDER BY quality_score DESC NULLS LAST, id ASC
               ) = 1 AS keep
        FROM scored
    """


def dedup_ngram_jaccard_sql(
    threshold: float = 0.3,
    shingle_n: int = 3,
    max_shingle_df: int | None = 1000,
) -> str:
    # Mirror of the Spark hot-shingle valve: shingles with document
    # frequency > cap are excluded from the JOIN only; sizes still count
    # them (dedup.ngram_jaccard_pairs semantics).
    df_filter = (
        f"""joinable AS (
          SELECT shingle FROM ex GROUP BY shingle
          HAVING count(*) <= {max_shingle_df}
        ),
        exj AS (SELECT ex.id, ex.shingle FROM ex JOIN joinable USING (shingle))"""
        if max_shingle_df is not None
        else "exj AS (SELECT id, shingle FROM ex)"
    )
    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (SELECT id, __sh__ FROM shingled WHERE len(__sh__) > 0),
        sizes AS (SELECT id, len(__sh__) AS n_sh FROM base),
        ex AS (SELECT id, unnest(__sh__) AS shingle FROM base),
        {df_filter},
        common AS (
          SELECT a.id AS id_1, b.id AS id_2, count(*) AS n_common
          FROM exj a JOIN exj b ON a.shingle = b.shingle
          WHERE a.id < b.id
          GROUP BY 1, 2
        )
        SELECT id_1, id_2,
               n_common * 1.0 / (s1.n_sh + s2.n_sh - n_common) AS jaccard
        FROM common
        JOIN sizes s1 ON id_1 = s1.id
        JOIN sizes s2 ON id_2 = s2.id
        WHERE n_common * 1.0 / (s1.n_sh + s2.n_sh - n_common) >= {threshold}
    """


def dedup_simhash_sql(
    bits: int = 32, band_bits: int = 16, max_hamming: int = 2, shingle_n: int = 3
) -> str:
    n_bands = bits // band_bits
    band_union = "\n          UNION ALL ".join(
        f"SELECT id, sh, {b} AS band_idx, substr(sh, {b * band_bits + 1}, {band_bits}) AS bucket FROM hashed"
        for b in range(n_bands)
    )
    hamming = (
        f"CAST(coalesce(list_sum(list_transform(generate_series(1, {bits}), "
        f"i -> CASE WHEN substr(sh_1, i, 1) <> substr(sh_2, i, 1) THEN 1 ELSE 0 END)), 0) AS BIGINT)"
    )
    return f"""
        {_DOC_BASE},
        distinct_toks0 AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __dt__ FROM toked
        ),
        -- docs with fewer than n tokens have no shingles: dropped, exactly
        -- like the Spark side's shingle_arrays size() > 0 filter
        distinct_toks AS (
          SELECT id, __dt__ FROM distinct_toks0 WHERE len(__dt__) > 0
        ),
        hashed AS (
          SELECT id, {simhash_expr(bits)} AS sh FROM distinct_toks
        ),
        buckets AS (
          {band_union}
        ),
        candidates AS (
          SELECT DISTINCT a.id AS id_1, a.sh AS sh_1, b.id AS id_2, b.sh AS sh_2
          FROM buckets a JOIN buckets b
            ON a.band_idx = b.band_idx AND a.bucket = b.bucket
          WHERE a.id < b.id
        )
        SELECT id_1, id_2, {hamming} AS hamming
        FROM candidates
        WHERE {hamming} <= {max_hamming}
    """


def dedup_embedding_sql(
    dim: int = 64, threshold: float = 0.25, n_planes: int = 4, round_digits: int = 6
) -> str:
    return f"""
        WITH base AS (
          SELECT vec_id AS id, embedding AS vec,
                 {srp_bucket('embedding', dim, n_planes)} AS bucket
          FROM embeddings
        )
        SELECT a.id AS id_1, b.id AS id_2,
               round({cosine('a.vec', 'b.vec', dim)}, {round_digits}) AS cos_sim
        FROM base a JOIN base b ON a.bucket = b.bucket
        WHERE a.id < b.id
          AND round({cosine('a.vec', 'b.vec', dim)}, {round_digits}) >= {threshold}
    """


def bloom_membership_sql(m_bits: int = 2048, k_hashes: int = 3) -> str:
    """Mirror of catalog.bloom_membership: identical double-hashed bit
    positions, 32-bit words, bit_or build, all-bits-set probe."""
    h1 = "('0x' || substr(md5(key), 1, 15))::BIGINT"
    h2 = "(('0x' || substr(md5(key), 16, 15))::BIGINT * 2 + 1)"
    return f"""
        WITH seen AS (
          SELECT DISTINCT coalesce(text, '') AS key
          FROM documents WHERE doc_id % 2 = 0
        ),
        build_pos AS (
          SELECT (({h1}) + j * ({h2})) % {m_bits} AS p
          FROM seen, unnest(generate_series(0, {k_hashes - 1})) AS t(j)
        ),
        bloom AS (
          SELECT p // 32 AS word_idx,
                 bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
          FROM build_pos GROUP BY 1
        ),
        probes AS (
          SELECT doc_id, coalesce(text, '') AS key FROM documents
        ),
        probe_pos AS (
          SELECT doc_id, key,
                 (({h1}) + j * ({h2})) % {m_bits} AS p
          FROM probes, unnest(generate_series(0, {k_hashes - 1})) AS t(j)
        ),
        verdict AS (
          SELECT doc_id,
                 min(CASE WHEN b.word IS NOT NULL
                           AND (b.word & (1::BIGINT << CAST(pp.p % 32 AS INT)))
                               <> 0
                          THEN 1 ELSE 0 END) = 1 AS bloom_hit
          FROM probe_pos pp LEFT JOIN bloom b ON pp.p // 32 = b.word_idx
          GROUP BY doc_id
        )
        SELECT v.doc_id, v.bloom_hit,
               (s.key IS NOT NULL) AS exact_hit
        FROM verdict v
        JOIN probes pr USING (doc_id)
        LEFT JOIN seen s ON pr.key = s.key
    """


def dedup_incremental_sql() -> str:
    """Mirror of catalog.dedup_incremental: even-id snapshot index,
    odd-id batch deduped against it and within itself."""
    return """
        WITH index_side AS (
          SELECT md5(coalesce(text, '')) AS dup_key,
                 min(doc_id) AS index_id
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
        ),
        batch AS (
          SELECT doc_id, md5(coalesce(text, '')) AS dup_key
          FROM documents WHERE doc_id % 2 = 1
        ),
        flags AS (
          SELECT doc_id, dup_key,
                 doc_id = min(doc_id) OVER (PARTITION BY dup_key)
                   AS first_in_batch
          FROM batch
        )
        SELECT f.doc_id, f.dup_key,
               (i.index_id IS NOT NULL) AS in_index,
               i.index_id AS dup_of,
               (f.first_in_batch AND i.index_id IS NULL) AS keep
        FROM flags f LEFT JOIN index_side i USING (dup_key)
    """


def dedup_index_retirement_sql() -> str:
    """Mirror of catalog.dedup_index_retirement: the even-id exact-key
    index minus its retired owners (doc_id % 10 = 0), then the odd-id
    batch screened against what remains — content whose owner retired
    reads as absent, so its batch duplicates come back keep=true."""
    return """
        WITH index_side AS (
          SELECT md5(coalesce(text, '')) AS dup_key,
                 min(doc_id) AS index_id
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
        ),
        live AS (
          SELECT * FROM index_side WHERE index_id % 10 <> 0
        ),
        batch AS (
          SELECT doc_id, md5(coalesce(text, '')) AS dup_key
          FROM documents WHERE doc_id % 2 = 1
        ),
        flags AS (
          SELECT doc_id, dup_key,
                 doc_id = min(doc_id) OVER (PARTITION BY dup_key)
                   AS first_in_batch
          FROM batch
        )
        SELECT f.doc_id, f.dup_key,
               (l.index_id IS NOT NULL) AS in_index,
               l.index_id AS dup_of,
               (f.first_in_batch AND l.index_id IS NULL) AS keep
        FROM flags f LEFT JOIN live l USING (dup_key)
    """


def semantic_dedup_sql(
    dim: int = 64,
    n_clusters: int = 16,
    threshold: float = 0.9,
    round_digits: int = 6,
) -> str:
    """Mirror of dedup.semantic_dedup: seeded lowest-id centroids,
    max-cosine assignment with lower-centroid-id tiebreak, within-cluster
    rounded-cosine prune against lower ids."""
    return f"""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding AS cvec
          FROM embeddings ORDER BY vec_id LIMIT {n_clusters}
        ),
        scored AS (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 {cosine('e.embedding', 'c.cvec', dim)} AS cc
          FROM embeddings e CROSS JOIN cents c
        ),
        members AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT vec_id, embedding, centroid_id,
                   row_number() OVER (
                     PARTITION BY vec_id ORDER BY cc DESC, centroid_id ASC
                   ) AS rn
            FROM scored
          ) WHERE rn = 1
        ),
        dominated AS (
          SELECT DISTINCT b.vec_id AS dom
          FROM members a JOIN members b USING (centroid_id)
          WHERE a.vec_id < b.vec_id
            AND round({cosine('a.embedding', 'b.embedding', dim)},
                      {round_digits}) >= {threshold}
        )
        SELECT m.vec_id, m.centroid_id,
               (d.dom IS NULL) AS keep
        FROM members m LEFT JOIN dominated d ON m.vec_id = d.dom
    """


def semantic_dedup_trained_sql(
    dim: int = 64,
    n_centroids: int = 8,
    n_rounds: int = 2,
    threshold: float = 0.35,
    gate: float = 0.15,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.dedup_semantic_trained: replay the
    ENGINE-EXACT kmeans rounds (micro-int cosine assignment ranks,
    order-independent BIGINT mean sums, half-away-from-zero integer
    division, component = mean_micro / 10⁶), then the semantic_dedup
    prune and the silhouette gate against the trained centroids.
    Every cross-engine comparison is on integers or on identical IEEE
    doubles built from integers — no double partial-sum ordering
    anywhere (similarity.kmeans_centroids_exact's contract)."""
    ccm = f"CAST(round({cosine('b.v', 'c.cvec', dim)} * 1000000) AS BIGINT)"
    rounds = []
    for r in range(1, n_rounds + 1):
        prev = f"c{r - 1}"
        rounds.append(f"""
        a{r} AS (
          SELECT id, v, centroid_id FROM (
            SELECT b.id, b.v, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {ccm} DESC, c.centroid_id ASC) AS rn
            FROM base b CROSS JOIN {prev} c
          ) WHERE rn = 1
        ),
        m{r} AS (
          SELECT centroid_id, i AS pos,
                 CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT))
                   AS BIGINT) AS s,
                 count(*) AS n
          FROM a{r}, generate_series(1, {dim}) AS g(i)
          GROUP BY centroid_id, i
        ),
        n{r} AS (
          SELECT centroid_id, list(comp ORDER BY pos) AS cvec FROM (
            SELECT centroid_id, pos,
                   (CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                         ELSE -(((-2 * s) + n) // (2 * n)) END)
                     / 1000000.0 AS comp
            FROM m{r}
          ) GROUP BY centroid_id
        ),
        c{r} AS (
          SELECT c.centroid_id, coalesce(n.cvec, c.cvec) AS cvec
          FROM {prev} c LEFT JOIN n{r} n USING (centroid_id)
        )""")
    last = f"c{n_rounds}"
    return f"""
        WITH base AS (
          SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER)
                   AS centroid_id,
                 v AS cvec
          FROM (SELECT id, v FROM base ORDER BY id LIMIT {n_centroids})
        ),
        {",".join(rounds)},
        scored AS (
          SELECT b.id, b.v, c.centroid_id,
                 {cosine('b.v', 'c.cvec', dim)} AS cc
          FROM base b CROSS JOIN {last} c
        ),
        members AS (
          SELECT id, v, centroid_id FROM (
            SELECT id, v, centroid_id,
                   row_number() OVER (
                     PARTITION BY id ORDER BY cc DESC, centroid_id ASC
                   ) AS rn
            FROM scored
          ) WHERE rn = 1
        ),
        dominated AS (
          SELECT DISTINCT b.id AS dom
          FROM members a JOIN members b USING (centroid_id)
          WHERE a.id < b.id
            AND round({cosine('a.v', 'b.v', dim)}, {round_digits})
                  >= {threshold}
        ),
        ranked AS (
          SELECT id, centroid_id, cc,
                 row_number() OVER (
                   PARTITION BY id ORDER BY cc DESC, centroid_id ASC
                 ) AS rn
          FROM scored
        ),
        per_vec AS (
          SELECT f.centroid_id AS own,
                 CAST(round(CASE WHEN (1.0 - s.cc) <= 0 THEN 0.0
                      ELSE (f.cc - s.cc) / (1.0 - s.cc) END * 1000000)
                   AS BIGINT) AS sm
          FROM (SELECT id, centroid_id, cc FROM ranked WHERE rn = 1) f
          JOIN (SELECT id, cc FROM ranked WHERE rn = 2) s USING (id)
        ),
        sil AS (
          SELECT own AS centroid_id,
                 round(CAST(sum(sm) AS DOUBLE) / (count(*) * 1000000.0),
                       {round_digits}) AS mean_silhouette
          FROM per_vec GROUP BY own
        )
        SELECT m.id AS vec_id, m.centroid_id,
               (d.dom IS NULL) AS keep_raw,
               sil.mean_silhouette,
               ((d.dom IS NULL) OR sil.mean_silhouette < {gate}) AS keep
        FROM members m
        LEFT JOIN dominated d ON m.id = d.dom
        LEFT JOIN sil USING (centroid_id)
    """


def dedup_incremental_semantic_sql(
    dim: int = 64,
    n_centroids: int = 8,
    n_rounds: int = 2,
    threshold: float = 0.35,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.dedup_incremental_semantic: replay the
    ENGINE-EXACT kmeans rounds on the EVEN-id corpus only (the
    semantic_dedup_trained_sql machinery restricted to the training
    half), derive the corpus member table and the batch routing with
    the same micro-int cosine rank the Spark assignment uses, then
    score each batch vector against its assigned cluster's members
    with the rounded cosine; keep iff best < threshold (or the cluster
    is empty of members)."""
    ccm = f"CAST(round({cosine('b.v', 'c.cvec', dim)} * 1000000) AS BIGINT)"
    rounds = []
    for r in range(1, n_rounds + 1):
        prev = f"c{r - 1}"
        rounds.append(f"""
        a{r} AS (
          SELECT id, v, centroid_id FROM (
            SELECT b.id, b.v, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {ccm} DESC, c.centroid_id ASC) AS rn
            FROM base b CROSS JOIN {prev} c
          ) WHERE rn = 1
        ),
        m{r} AS (
          SELECT centroid_id, i AS pos,
                 CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT))
                   AS BIGINT) AS s,
                 count(*) AS n
          FROM a{r}, generate_series(1, {dim}) AS g(i)
          GROUP BY centroid_id, i
        ),
        n{r} AS (
          SELECT centroid_id, list(comp ORDER BY pos) AS cvec FROM (
            SELECT centroid_id, pos,
                   (CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                         ELSE -(((-2 * s) + n) // (2 * n)) END)
                     / 1000000.0 AS comp
            FROM m{r}
          ) GROUP BY centroid_id
        ),
        c{r} AS (
          SELECT c.centroid_id, coalesce(n.cvec, c.cvec) AS cvec
          FROM {prev} c LEFT JOIN n{r} n USING (centroid_id)
        )""")
    last = f"c{n_rounds}"
    return f"""
        WITH base AS (
          SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id % 2 = 0
        ),
        batch AS (
          SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id % 2 = 1
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER)
                   AS centroid_id,
                 v AS cvec
          FROM (SELECT id, v FROM base ORDER BY id LIMIT {n_centroids})
        ),
        {",".join(rounds)},
        members AS (
          SELECT id AS index_id, v AS iv, centroid_id FROM (
            SELECT b.id, b.v, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {ccm} DESC, c.centroid_id ASC) AS rn
            FROM base b CROSS JOIN {last} c
          ) WHERE rn = 1
        ),
        routed AS (
          SELECT id, v AS bv, centroid_id FROM (
            SELECT b.id, b.v, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {ccm} DESC, c.centroid_id ASC) AS rn
            FROM batch b CROSS JOIN {last} c
          ) WHERE rn = 1
        ),
        scored AS (
          SELECT r.id, m.index_id,
                 round({cosine('r.bv', 'm.iv', dim)},
                       {round_digits}) AS cos
          FROM routed r JOIN members m USING (centroid_id)
        ),
        per AS (
          SELECT id,
                 CAST(count(*) AS BIGINT) AS n_candidates,
                 max(CASE WHEN rn = 1 THEN index_id END)
                   AS best_match_id,
                 max(CASE WHEN rn = 1 THEN cos END) AS best_cosine
          FROM (
            SELECT id, index_id, cos,
                   row_number() OVER (
                     PARTITION BY id ORDER BY cos DESC, index_id ASC
                   ) AS rn
            FROM scored
          ) GROUP BY id
        )
        SELECT r.id AS vec_id, r.centroid_id,
               coalesce(per.n_candidates, 0) AS n_candidates,
               per.best_match_id,
               per.best_cosine,
               (per.best_cosine IS NULL
                OR per.best_cosine < {threshold}) AS keep
        FROM routed r LEFT JOIN per ON r.id = per.id
    """


def dedup_semantic_compaction_sql(
    dim: int = 64,
    n_centroids: int = 8,
    n_rounds: int = 2,
    threshold: float = 0.35,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.dedup_semantic_compaction: replay the
    engine-exact kmeans rounds on the vec_id%3==0 SEED, then fold the
    two ingestion rounds — each batch routed with the micro-int cosine
    rank, rejected iff any member of its assigned cluster IN THE
    MEMBERS-SO-FAR reaches the rounded-cosine threshold, accepted rows
    joining the member set for the next round. Emits the final member
    table (index_id, centroid_id, nrm rounded)."""
    ccm = f"CAST(round({cosine('b.v', 'c.cvec', dim)} * 1000000) AS BIGINT)"
    rounds = []
    for r in range(1, n_rounds + 1):
        prev = f"c{r - 1}"
        rounds.append(f"""
        a{r} AS (
          SELECT id, v, centroid_id FROM (
            SELECT b.id, b.v, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {ccm} DESC, c.centroid_id ASC) AS rn
            FROM base b CROSS JOIN {prev} c
          ) WHERE rn = 1
        ),
        m{r} AS (
          SELECT centroid_id, i AS pos,
                 CAST(sum(CAST(round(v[i] * 1000000) AS BIGINT))
                   AS BIGINT) AS s,
                 count(*) AS n
          FROM a{r}, generate_series(1, {dim}) AS g(i)
          GROUP BY centroid_id, i
        ),
        n{r} AS (
          SELECT centroid_id, list(comp ORDER BY pos) AS cvec FROM (
            SELECT centroid_id, pos,
                   (CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                         ELSE -(((-2 * s) + n) // (2 * n)) END)
                     / 1000000.0 AS comp
            FROM m{r}
          ) GROUP BY centroid_id
        ),
        c{r} AS (
          SELECT c.centroid_id, coalesce(n.cvec, c.cvec) AS cvec
          FROM {prev} c LEFT JOIN n{r} n USING (centroid_id)
        )""")
    last = f"c{n_rounds}"

    def route(src: str) -> str:
        return f"""
          SELECT id, v, centroid_id FROM (
            SELECT b.id, b.v, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY {ccm} DESC, c.centroid_id ASC) AS rn
            FROM {src} b CROSS JOIN {last} c
          ) WHERE rn = 1
        """

    cos_rm = f"round({cosine('r.v', 'm.v', dim)}, {round_digits})"
    return f"""
        WITH base AS (
          SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id % 3 = 0
        ),
        batch1 AS (
          SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id % 3 = 1
        ),
        batch2 AS (
          SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id % 3 = 2
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER)
                   AS centroid_id,
                 v AS cvec
          FROM (SELECT id, v FROM base ORDER BY id LIMIT {n_centroids})
        ),
        {",".join(rounds)},
        mem0 AS ({route("base")}),
        r1 AS ({route("batch1")}),
        rej1 AS (
          SELECT DISTINCT r.id FROM r1 r JOIN mem0 m USING (centroid_id)
          WHERE {cos_rm} >= {threshold}
        ),
        mem1 AS (
          SELECT * FROM mem0
          UNION ALL
          SELECT * FROM r1 WHERE id NOT IN (SELECT id FROM rej1)
        ),
        r2 AS ({route("batch2")}),
        rej2 AS (
          SELECT DISTINCT r.id FROM r2 r JOIN mem1 m USING (centroid_id)
          WHERE {cos_rm} >= {threshold}
        ),
        mem2 AS (
          SELECT * FROM mem1
          UNION ALL
          SELECT * FROM r2 WHERE id NOT IN (SELECT id FROM rej2)
        )
        SELECT id AS index_id, centroid_id,
               round(sqrt({dot('m.v', 'm.v', dim)}), {round_digits})
                 AS nrm
        FROM mem2 m
    """


def similarity_topk_sql(
    dim: int = 64, k: int = 10, n_queries: int = 5, round_digits: int = 6
) -> str:
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id < {n_queries}
        ),
        pairs AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 round({cosine('q.qv', 'c.embedding', dim)}, {round_digits}) AS cos_sim
          FROM embeddings c CROSS JOIN q
          WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
          FROM pairs
        ) ranked WHERE rank <= {k}
    """


def pq_recall_sql(
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    k: int = 10,
    n_queries: int = 5,
    round_digits: int = 6,
) -> str:
    """Mirror of similarity.pq_recall: seeded per-subspace codebooks,
    L2² argmin encoding (ordered-fold doubles, lower-code tiebreak),
    micro-int ADC partial dots, exact-integer candidate sums."""
    sd = dim // m
    l2 = (
        f"coalesce(list_sum(list_transform(generate_series(1, {sd}), "
        f"i -> (sub.subv[i] - cb.cvec[i]) * (sub.subv[i] - cb.cvec[i]))), "
        f"0.0)"
    )
    pdot = (
        f"coalesce(list_sum(list_transform(generate_series(1, {sd}), "
        f"i -> q.qv[cb.s * {sd} + i] * cb.cvec[i])), 0.0)"
    )
    cn2 = (
        f"coalesce(list_sum(list_transform(generate_series(1, {sd}), "
        f"i -> cb.cvec[i] * cb.cvec[i])), 0.0)"
    )
    return f"""
        WITH base AS (
          SELECT vec_id AS vid,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        spine AS (SELECT unnest(generate_series(0, {m - 1})) AS s),
        seeds AS (
          SELECT vid, v,
                 CAST(row_number() OVER (ORDER BY vid) - 1 AS INT)
                   AS code_id
          FROM (SELECT * FROM base ORDER BY vid LIMIT {n_codes})
        ),
        cb AS MATERIALIZED (
          SELECT spine.s, seeds.code_id,
                 array_slice(seeds.v, spine.s * {sd} + 1,
                             (spine.s + 1) * {sd}) AS cvec
          FROM seeds, spine
        ),
        sub AS (
          SELECT base.vid, spine.s,
                 array_slice(base.v, spine.s * {sd} + 1,
                             (spine.s + 1) * {sd}) AS subv
          FROM base, spine
        ),
        enc AS MATERIALIZED (
          SELECT vid, s, code_id FROM (
            SELECT sub.vid, sub.s, cb.code_id,
                   row_number() OVER (
                     PARTITION BY sub.vid, sub.s
                     ORDER BY {l2} ASC, cb.code_id ASC) AS rn
            FROM sub JOIN cb USING (s)
          ) WHERE rn = 1
        ),
        q AS (
          SELECT vid AS query_id, v AS qv, sqrt({dot('v', 'v', dim)}) AS qn
          FROM base WHERE vid < {n_queries}
        ),
        adc AS MATERIALIZED (
          SELECT q.query_id, q.qn, cb.s, cb.code_id,
                 CAST(round({pdot} * 1000000.0) AS BIGINT) AS d_micro,
                 CAST(round({cn2} * 1000000.0) AS BIGINT) AS n2_micro
          FROM q, cb
        ),
        scored AS (
          SELECT a.query_id, a.qn, e.vid,
                 sum(a.d_micro) AS sd_sum, sum(a.n2_micro) AS sn2_sum
          FROM enc e JOIN adc a USING (s, code_id)
          WHERE e.vid <> a.query_id
          GROUP BY 1, 2, 3
        ),
        pq_top AS (
          SELECT query_id, vid AS neighbor_id FROM (
            SELECT query_id, vid,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY CASE WHEN sn2_sum > 0
                       THEN (CAST(sd_sum AS DOUBLE) / 1000000.0)
                            / (qn * sqrt(CAST(sn2_sum AS DOUBLE)
                                         / 1000000.0))
                       ELSE -2.0 END DESC, vid ASC) AS rn
            FROM scored
          ) WHERE rn <= {k}
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vid AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY round({cosine('q.qv', 'c.v', dim)},
                                    {round_digits}) DESC,
                              c.vid ASC) AS rn
            FROM base c, q
            WHERE c.vid <> q.query_id
          ) WHERE rn <= {k}
        )
        SELECT e.query_id,
               count(*) AS k_exact,
               CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
               round(CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL
                                   THEN 1 ELSE 0 END) AS BIGINT)
                     / count(*), {round_digits}) AS recall
        FROM exact e
        LEFT JOIN pq_top p
          ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
    """


def kcenter_select_sql(
    dim: int = 64,
    k: int = 12,
    id_out: str = "vec_id",
) -> str:
    """Mirror of similarity.kcenter_select: greedy farthest-point
    sampling with micro-int cosine distances, unrolled as k MATERIALIZED
    CTE rounds (lowest-id seed, max-min-dist picks, lower-id ties)."""
    def dist(a: str, b: str, an: str, bn: str) -> str:
        return (
            f"CAST(round((1.0 - {dot(a, b, dim)} / ({an} * {bn})) "
            f"* 1000000.0) AS BIGINT)"
        )

    rounds = []
    for r in range(2, k + 1):
        prev = r - 1
        rounds.append(f"""
        p{r} AS MATERIALIZED (
          SELECT vid, v, n, mind FROM st{prev}
          ORDER BY mind DESC, vid ASC LIMIT 1
        ),
        st{r} AS MATERIALIZED (
          SELECT s.vid, s.v, s.n,
                 least(s.mind, {dist('s.v', 'p.v', 's.n', 'p.n')}) AS mind
          FROM st{prev} s, p{r} p
          WHERE s.vid <> p.vid
        )""")
    chain = ",".join(rounds)
    final = "\nUNION ALL\n".join(
        f"SELECT {r} AS pick_rank, vid AS {id_out}, "
        f"mind AS dist_to_selected_micro FROM p{r}"
        for r in range(2, k + 1)
    )
    return f"""
        WITH base AS (
          SELECT vec_id AS vid,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 sqrt({dot('embedding', 'embedding', dim)}) AS n
          FROM embeddings
        ),
        p1 AS MATERIALIZED (
          SELECT vid, v, n FROM base ORDER BY vid ASC LIMIT 1
        ),
        st1 AS MATERIALIZED (
          SELECT b.vid, b.v, b.n,
                 {dist('b.v', 'p.v', 'b.n', 'p.n')} AS mind
          FROM base b, p1 p
          WHERE b.vid <> p.vid
        ),{chain}
        SELECT 1 AS pick_rank, vid AS {id_out},
               CAST(NULL AS BIGINT) AS dist_to_selected_micro
        FROM p1
        UNION ALL
        {final}
    """


def embedding_dim_stats_sql(round_digits: int = 6) -> str:
    """Mirror of similarity.embedding_dim_stats: micro-int exact sums
    per dimension, identical double expressions for mean/std."""
    return f"""
        WITH ex AS (
          SELECT i - 1 AS pos,
                 CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                      AS BIGINT) AS xm
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS t(i)
        ),
        g AS (
          SELECT pos,
                 count(*) AS n,
                 CAST(sum(CASE WHEN xm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero,
                 sum(CAST(xm AS HUGEINT)) AS s,
                 sum(CAST(xm AS HUGEINT) * CAST(xm AS HUGEINT)) AS ssq,
                 min(xm) AS mn, max(xm) AS mx
          FROM ex GROUP BY pos
        )
        SELECT CAST(pos AS INT) AS pos,
               CAST(n AS BIGINT) AS n,
               n_zero,
               round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0,
                     {round_digits}) AS mean,
               round(sqrt(CAST(n * ssq - s * s AS DOUBLE))
                     / CAST(n AS DOUBLE) / 1000000.0,
                     {round_digits}) AS std,
               round(CAST(mn AS DOUBLE) / 1000000.0, {round_digits})
                 AS min_val,
               round(CAST(mx AS DOUBLE) / 1000000.0, {round_digits})
                 AS max_val
        FROM g
    """


def ivfpq_recall_sql(
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    n_queries: int = 5,
    round_digits: int = 6,
) -> str:
    """Mirror of similarity.ivfpq_recall: seeded IVF assignment +
    probes, seeded PQ codebooks + encoding, ADC micro-int scoring over
    the probed candidates, exact grading."""
    sd = dim // m
    l2 = (
        f"coalesce(list_sum(list_transform(generate_series(1, {sd}), "
        f"i -> (sub.subv[i] - cb.cvec[i]) * (sub.subv[i] - cb.cvec[i]))), "
        f"0.0)"
    )
    pdot = (
        f"coalesce(list_sum(list_transform(generate_series(1, {sd}), "
        f"i -> q.qv[cb.s * {sd} + i] * cb.cvec[i])), 0.0)"
    )
    cn2 = (
        f"coalesce(list_sum(list_transform(generate_series(1, {sd}), "
        f"i -> cb.cvec[i] * cb.cvec[i])), 0.0)"
    )
    return f"""
        WITH base AS (
          SELECT vec_id AS vid,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        spine AS (SELECT unnest(generate_series(0, {m - 1})) AS s),
        seeds AS (
          SELECT vid, v,
                 CAST(row_number() OVER (ORDER BY vid) - 1 AS INT)
                   AS code_id
          FROM (SELECT * FROM base ORDER BY vid LIMIT {n_codes})
        ),
        cb AS MATERIALIZED (
          SELECT spine.s, seeds.code_id,
                 array_slice(seeds.v, spine.s * {sd} + 1,
                             (spine.s + 1) * {sd}) AS cvec
          FROM seeds, spine
        ),
        sub AS (
          SELECT base.vid, spine.s,
                 array_slice(base.v, spine.s * {sd} + 1,
                             (spine.s + 1) * {sd}) AS subv
          FROM base, spine
        ),
        enc AS MATERIALIZED (
          SELECT vid, s, code_id FROM (
            SELECT sub.vid, sub.s, cb.code_id,
                   row_number() OVER (
                     PARTITION BY sub.vid, sub.s
                     ORDER BY {l2} ASC, cb.code_id ASC) AS rn
            FROM sub JOIN cb USING (s)
          ) WHERE rn = 1
        ),
        cents AS MATERIALIZED (
          SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INT)
                   AS centroid_id, v AS cv
          FROM (SELECT * FROM base ORDER BY vid LIMIT {n_centroids})
        ),
        assign AS MATERIALIZED (
          SELECT vid, centroid_id FROM (
            SELECT b.vid, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY b.vid
                     ORDER BY {cosine('b.v', 'c.cv', dim)} DESC,
                              c.centroid_id ASC) AS rn
            FROM base b, cents c
          ) WHERE rn = 1
        ),
        q AS (
          SELECT vid AS query_id, v AS qv, sqrt({dot('v', 'v', dim)}) AS qn
          FROM base WHERE vid < {n_queries}
        ),
        probes AS (
          SELECT query_id, centroid_id FROM (
            SELECT q.query_id, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY {cosine('q.qv', 'c.cv', dim)} DESC,
                              c.centroid_id ASC) AS rn
            FROM q, cents c
          ) WHERE rn <= {n_probe}
        ),
        cands AS MATERIALIZED (
          SELECT p.query_id, a.vid
          FROM probes p JOIN assign a USING (centroid_id)
          WHERE a.vid <> p.query_id
        ),
        adc AS MATERIALIZED (
          SELECT q.query_id, q.qn, cb.s, cb.code_id,
                 CAST(round({pdot} * 1000000.0) AS BIGINT) AS d_micro,
                 CAST(round({cn2} * 1000000.0) AS BIGINT) AS n2_micro
          FROM q, cb
        ),
        scored AS (
          SELECT a.query_id, a.qn, e.vid,
                 sum(a.d_micro) AS sd_sum, sum(a.n2_micro) AS sn2_sum
          FROM cands cd
          JOIN enc e ON e.vid = cd.vid
          JOIN adc a ON a.query_id = cd.query_id
                    AND a.s = e.s AND a.code_id = e.code_id
          GROUP BY 1, 2, 3
        ),
        pq_top AS (
          SELECT query_id, vid AS neighbor_id FROM (
            SELECT query_id, vid,
                   row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY CASE WHEN sn2_sum > 0
                       THEN (CAST(sd_sum AS DOUBLE) / 1000000.0)
                            / (qn * sqrt(CAST(sn2_sum AS DOUBLE)
                                         / 1000000.0))
                       ELSE -2.0 END DESC, vid ASC) AS rn
            FROM scored
          ) WHERE rn <= {k}
        ),
        ncands AS (
          SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
          FROM cands GROUP BY 1
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vid AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY round({cosine('q.qv', 'c.v', dim)},
                                    {round_digits}) DESC,
                              c.vid ASC) AS rn
            FROM base c, q
            WHERE c.vid <> q.query_id
          ) WHERE rn <= {k}
        )
        SELECT g.query_id, g.k_exact,
               coalesce(n.n_candidates, 0) AS n_candidates,
               g.n_overlap,
               round(CAST(g.n_overlap AS BIGINT) / g.k_exact,
                     {round_digits}) AS recall
        FROM (
          SELECT e.query_id,
                 count(*) AS k_exact,
                 CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
          FROM exact e
          LEFT JOIN pq_top p
            ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
          GROUP BY e.query_id
        ) g
        LEFT JOIN ncands n USING (query_id)
    """


def mmr_rerank_sql(
    dim: int = 64,
    k: int = 10,
    n_candidates: int = 50,
    n_queries: int = 5,
    lambda_milli: int = 700,
    round_digits: int = 6,
) -> str:
    """Mirror of similarity.mmr_rerank: exact top-n candidates, then k
    greedy MMR rounds unrolled as chained MATERIALIZED CTEs (each round
    is referenced multiple times — inlining would re-evaluate the chain
    exponentially). The greedy score is exact BIGINT micro-unit
    arithmetic, so every round's argmax matches bit-for-bit."""
    lam = lambda_milli
    oml = 1000 - lambda_milli
    rd = round_digits
    rounds = []
    for r in range(1, k + 1):
        prev = r - 1
        rounds.append(f"""
        ms{r} AS MATERIALIZED (
          SELECT r.query_id, r.neighbor_id,
                 max(CAST(round({cosine('r.__v__', 's.__v__', dim)}
                                * 1000000.0) AS BIGINT)) AS maxsim
          FROM rem{prev} r JOIN sel{prev} s USING (query_id)
          GROUP BY 1, 2
        ),
        scored{r} AS (
          SELECT r.query_id, r.neighbor_id, r.__v__, r.rel_sim,
                 r.rel_micro,
                 {lam} * r.rel_micro
                   - {oml} * coalesce(m.maxsim, 0) AS score
          FROM rem{prev} r
          LEFT JOIN ms{r} m
            ON m.query_id = r.query_id AND m.neighbor_id = r.neighbor_id
        ),
        pick{r} AS MATERIALIZED (
          SELECT query_id, neighbor_id, __v__, rel_sim, rel_micro,
                 CAST(score AS BIGINT) AS mmr_score_nano, {r} AS mmr_rank
          FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS rn
            FROM scored{r}
          ) WHERE rn = 1
        ),
        sel{r} AS MATERIALIZED (
          SELECT query_id, neighbor_id, __v__ FROM sel{prev}
          UNION ALL
          SELECT query_id, neighbor_id, __v__ FROM pick{r}
        ),
        rem{r} AS MATERIALIZED (
          SELECT r.* FROM rem{prev} r
          LEFT JOIN pick{r} p
            ON p.query_id = r.query_id AND p.neighbor_id = r.neighbor_id
          WHERE p.neighbor_id IS NULL
        )""")
    chain = ",".join(rounds)
    final = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, rel_sim, mmr_score_nano, mmr_rank "
        f"FROM pick{r}"
        for r in range(1, k + 1)
    )
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id < {n_queries}
        ),
        pairs AS (
          SELECT q.query_id, c.vec_id AS neighbor_id, c.embedding AS __v__,
                 round({cosine('q.qv', 'c.embedding', dim)}, {rd})
                   AS rel_sim,
                 CAST(round({cosine('q.qv', 'c.embedding', dim)}
                            * 1000000.0) AS BIGINT) AS rel_micro
          FROM embeddings c CROSS JOIN q
          WHERE c.vec_id <> q.query_id
        ),
        rem0 AS MATERIALIZED (
          SELECT query_id, neighbor_id, __v__, rel_sim, rel_micro FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY rel_micro DESC, neighbor_id ASC) AS rn
            FROM pairs
          ) WHERE rn <= {n_candidates}
        ),
        sel0 AS (
          SELECT query_id, neighbor_id, __v__ FROM rem0 WHERE 1 = 0
        ),{chain}
        {final}
    """


def label_knn_agreement_sql(
    dim: int = 64, k: int = 5, n_planes: int = 8, min_agree: float = 0.5,
    round_digits: int = 6,
) -> str:
    """Mirror of similarity.label_knn_agreement: every vector queries
    its SRP bucket + Hamming-1 flips, k nearest candidates (cos desc,
    id asc) vote on the label. count(*) FILTER keeps counters BIGINT;
    suspect compares the UNROUNDED fraction like the Spark side."""
    flips = ", ".join(
        f"substr(bucket, 1, {i}) || "
        f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substr(bucket, {i + 2}, {n_planes - i - 1})"
        for i in range(n_planes)
    )
    return f"""
        WITH base AS (
          SELECT vec_id, label, embedding,
                 {srp_bucket('embedding', dim, n_planes)} AS bucket
          FROM embeddings
        ),
        q AS (
          SELECT vec_id AS query_id, label AS ql, embedding AS qv,
                 unnest([bucket, {flips}]) AS bucket
          FROM base
        ),
        pairs AS (
          SELECT q.query_id, q.ql, c.label AS nl, c.vec_id AS neighbor_id,
                 round({cosine('q.qv', 'c.embedding', dim)},
                       {round_digits}) AS cos_sim
          FROM base c JOIN q ON c.bucket = q.bucket
          WHERE c.vec_id <> q.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
          FROM pairs
        )
        SELECT query_id AS vec_id, ql AS label,
               count(*) AS n_neighbors,
               count(*) FILTER (WHERE nl = ql) AS n_agree,
               round(count(*) FILTER (WHERE nl = ql) * 1.0 / count(*),
                     {round_digits}) AS agree_frac,
               (count(*) FILTER (WHERE nl = ql) * 1.0 / count(*))
                 < {min_agree} AS suspect
        FROM ranked WHERE rnk <= {k}
        GROUP BY query_id, ql
    """


def contrastive_pairs_sql(
    dim: int = 64, k: int = 5, n_queries: int = 8, round_digits: int = 6,
) -> str:
    """Mirror of similarity.contrastive_pairs: per anchor, top-k
    same-label (pos) and top-k different-label (neg) by cosine, rank
    restarting per kind with the (cos desc, id asc) tiebreak."""
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, label AS query_label, embedding AS qv
          FROM embeddings WHERE vec_id < {n_queries}
        ),
        pairs AS (
          SELECT q.query_id, q.query_label,
                 c.vec_id AS neighbor_id, c.label AS neighbor_label,
                 CASE WHEN c.label = q.query_label THEN 'pos'
                      ELSE 'neg' END AS kind,
                 round({cosine('q.qv', 'c.embedding', dim)},
                       {round_digits}) AS cos_sim
          FROM embeddings c CROSS JOIN q
          WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, query_label, neighbor_id, neighbor_label, kind,
               cos_sim, rank
        FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id, kind
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER
                 ) AS rank
          FROM pairs
        ) ranked WHERE rank <= {k}
    """


def similarity_ann_sql(
    dim: int = 64, k: int = 10, n_queries: int = 5, n_planes: int = 8,
    round_digits: int = 6,
) -> str:
    """Mirrors srp_ann_topk WITH Hamming-1 multiprobe (the operator
    default): each query probes its own bucket plus every one-bit flip."""
    flips = ", ".join(
        f"substr(bucket, 1, {i}) || "
        f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substr(bucket, {i + 2}, {n_planes - i - 1})"
        for i in range(n_planes)
    )
    return f"""
        WITH base AS (
          SELECT vec_id, embedding,
                 {srp_bucket('embedding', dim, n_planes)} AS bucket
          FROM embeddings
        ),
        q AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 unnest([bucket, {flips}]) AS bucket
          FROM base WHERE vec_id < {n_queries}
        ),
        pairs AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 round({cosine('q.qv', 'c.embedding', dim)}, {round_digits}) AS cos_sim
          FROM base c JOIN q ON c.bucket = q.bucket
          WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
          FROM pairs
        ) ranked WHERE rank <= {k}
    """


def cluster_silhouette_sql(
    dim: int = 64, n_centroids: int = 16, round_digits: int = 6
) -> str:
    """Mirror of similarity.cluster_silhouette: lowest-id seeded
    centroids, two best cosines per vector via the same ranked window,
    micro-unit integer silhouette sums."""
    return f"""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding AS cvec
          FROM embeddings ORDER BY vec_id LIMIT {n_centroids}
        ),
        scored AS (
          SELECT e.vec_id AS id, c.centroid_id,
                 {cosine('e.embedding', 'c.cvec', dim)} AS cc
          FROM embeddings e CROSS JOIN cents c
        ),
        ranked AS (
          SELECT id, centroid_id, cc,
                 row_number() OVER (
                   PARTITION BY id ORDER BY cc DESC, centroid_id ASC
                 ) AS rn
          FROM scored
        ),
        per_vec AS (
          SELECT f.centroid_id AS own,
                 CAST(round(CASE WHEN (1.0 - s.cc) <= 0 THEN 0.0
                      ELSE (f.cc - s.cc) / (1.0 - s.cc) END * 1000000)
                   AS BIGINT) AS sm
          FROM (SELECT id, centroid_id, cc FROM ranked WHERE rn = 1) f
          JOIN (SELECT id, cc FROM ranked WHERE rn = 2) s USING (id)
        )
        SELECT own AS centroid_id,
               count(*) AS n_members,
               round(CAST(sum(sm) AS DOUBLE) / (count(*) * 1000000.0),
                     {round_digits}) AS mean_silhouette,
               round(CAST(min(sm) AS DOUBLE) / 1000000.0, {round_digits})
                 AS min_silhouette
        FROM per_vec
        GROUP BY own
        ORDER BY own
    """


def similarity_ivf_sql(
    dim: int = 64, k: int = 10, n_queries: int = 5, n_centroids: int = 16,
    n_probe: int = 4, round_digits: int = 6,
) -> str:
    """IVF-flat mirror: deterministic centroids (lowest ids), nearest-
    centroid assignment with lower-id tiebreak, n_probe lists per query."""
    return f"""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding AS cvec
          FROM embeddings ORDER BY vec_id LIMIT {n_centroids}
        ),
        scored AS (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 {cosine('e.embedding', 'c.cvec', dim)} AS cc
          FROM embeddings e CROSS JOIN cents c
        ),
        assign AS (
          SELECT vec_id, embedding, centroid_id,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY cc DESC, centroid_id ASC
                 ) AS rn
          FROM scored
        ),
        corpus_lists AS (
          SELECT vec_id AS neighbor_id, embedding AS cv, centroid_id
          FROM assign WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, embedding AS qv, centroid_id
          FROM assign WHERE rn <= {n_probe} AND vec_id < {n_queries}
        ),
        pairs AS (
          SELECT p.query_id, cl.neighbor_id,
                 round({cosine('p.qv', 'cl.cv', dim)}, {round_digits}) AS cos_sim
          FROM probes p JOIN corpus_lists cl USING (centroid_id)
          WHERE cl.neighbor_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
          FROM pairs
        ) ranked WHERE rank <= {k}
    """


def text_chunks_sql(size: int = 400, overlap: int = 100) -> str:
    """Mirror of operators/chunking.py: same starts (capped so no chunk
    is a strict substring of its predecessor), same substr window."""
    step = size - overlap
    return f"""
        WITH docs AS (
          SELECT doc_id, text, length(text) AS n
          FROM documents WHERE length(text) > 0
        ),
        st AS (
          SELECT doc_id, text, n,
                 unnest(generate_series(0, greatest(n - {overlap} - 1, 0),
                                        {step})) AS s
          FROM docs
        )
        SELECT doc_id,
               s // {step} AS chunk_idx,
               s AS chunk_start,
               substr(text, CAST(s + 1 AS INT), {size}) AS chunk_text,
               length(substr(text, CAST(s + 1 AS INT), {size})) AS chunk_len,
               greatest(n - {overlap} - 1, 0) // {step} + 1 AS n_chunks
        FROM st
    """


def text_token_stats_sql() -> str:
    from topnotch_spark.functions.text import BPE_ISH_PATTERN

    return f"""
        {_DOC_BASE}
        SELECT doc_id,
               CAST(len(__t__) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(__t__)) AS INTEGER) AS n_distinct_tokens,
               CAST(len(regexp_extract_all(text, $${BPE_ISH_PATTERN}$$))
                    AS INTEGER) AS n_bpe_tokens,
               CASE WHEN len(__t__) > 0
                    THEN round(CAST(coalesce(list_sum(list_transform(__t__, t -> length(t))), 0) AS DOUBLE) / len(__t__), 4)
                    ELSE 0.0 END AS avg_token_len,
               CASE WHEN len(__t__) > 0
                    THEN round(len(list_distinct(__t__)) * 1.0 / len(__t__), 4)
                    ELSE 0.0 END AS type_token_ratio
        FROM toked
    """


def _stopword_ratio(markers: list[str]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return (
        "CASE WHEN len(__t__) > 0 THEN "
        f"len(list_filter(__t__, t -> t IN ({in_list}))) * 1.0 / len(__t__) "
        "ELSE 0.0 END"
    )


def text_quality_sql(stopwords: list[str]) -> str:
    alpha = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) "
        "ELSE 0.0 END"
    )
    sw = _stopword_ratio(stopwords)
    rep = (
        "CASE WHEN len(__t__) > 0 THEN len(list_distinct(__t__)) * 1.0 / len(__t__) "
        "ELSE 0.0 END"
    )
    length_score = "least(len(__t__) / 200.0, 1.0)"
    score = (
        f"round({length_score} * 0.25 + {alpha} * 0.25 "
        f"+ least({sw} * 5, 1.0) * 0.2 + {rep} * 0.3, 6)"
    )
    return f"""
        {_DOC_BASE}
        SELECT doc_id,
               CAST(len(__t__) AS INTEGER) AS n_tokens,
               round({alpha}, 6) AS alpha_ratio,
               round({sw}, 6) AS stopword_ratio,
               round({rep}, 6) AS distinct_ratio,
               {score} AS quality_score,
               {score} >= 0.5 AS passes_quality
        FROM toked
    """


def gopher_rules_sql(
    stopwords: list[str],
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    """Mirror of textqc.gopher_rules: same token/line model, same rounded
    ratios compared to the same thresholds."""
    sw = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
        WITH base AS (
          SELECT doc_id, coalesce(text, '') AS txt,
                 {tokens("coalesce(text, '')")} AS __t__,
                 string_split(coalesce(text, ''), chr(10)) AS __l__
          FROM documents
        ),
        m AS (
          SELECT doc_id,
            CAST(len(__t__) AS INTEGER) AS n_words,
            CASE WHEN len(__t__) > 0 THEN
              round(list_sum(list_transform(__t__, t -> length(t))) * 1.0
                    / len(__t__), 6)
            ELSE 0.0 END AS mean_word_len,
            CASE WHEN len(__t__) > 0 THEN
              round(((length(txt) - length(replace(txt, '#', '')))
                     + ((length(txt) - length(replace(txt, '...', ''))) // 3)
                     + (length(txt) - length(replace(txt, '…', '')))) * 1.0
                    / len(__t__), 6)
            ELSE 0.0 END AS symbol_ratio,
            round(len(list_filter(__l__, l ->
                    starts_with(trim(l), '-') OR starts_with(trim(l), '*')
                    OR starts_with(trim(l), '•'))) * 1.0
                  / len(__l__), 6) AS bullet_ratio,
            round(len(list_filter(__l__, l ->
                    ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
                  * 1.0 / len(__l__), 6) AS ellipsis_ratio,
            CASE WHEN len(__t__) > 0 THEN
              round(len(list_filter(__t__, t -> regexp_matches(t, '[a-z]')))
                    * 1.0 / len(__t__), 6)
            ELSE 0.0 END AS alpha_ratio,
            CAST(len(list_intersect(list_distinct(__t__), [{sw}]))
                 AS INTEGER) AS stop_hits
          FROM base
        )
        SELECT *,
               (n_words >= {min_words} AND n_words <= {max_words})
                 AS r_word_count,
               (mean_word_len >= {min_mean_len}
                AND mean_word_len <= {max_mean_len}) AS r_mean_len,
               (symbol_ratio <= {max_symbol_ratio}) AS r_symbol,
               (bullet_ratio <= {max_bullet_ratio}) AS r_bullet,
               (ellipsis_ratio <= {max_ellipsis_ratio}) AS r_ellipsis,
               (alpha_ratio >= {min_alpha_ratio}) AS r_alpha,
               (stop_hits >= {min_stop_hits}) AS r_stopwords,
               (n_words >= {min_words} AND n_words <= {max_words}
                AND mean_word_len >= {min_mean_len}
                AND mean_word_len <= {max_mean_len}
                AND symbol_ratio <= {max_symbol_ratio}
                AND bullet_ratio <= {max_bullet_ratio}
                AND ellipsis_ratio <= {max_ellipsis_ratio}
                AND alpha_ratio >= {min_alpha_ratio}
                AND stop_hits >= {min_stop_hits}) AS keep
        FROM m
    """


def text_langid_sql(lang_markers: dict[str, list[str]]) -> str:
    scores = {lang: _stopword_ratio(m) for lang, m in lang_markers.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    pred = "CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'"
    for lang in lang_markers:
        pred += f" WHEN {scores[lang]} = {best} THEN '{lang}'"
    pred += " END"
    score_cols = ",\n               ".join(
        f"round({scores[lang]}, 6) AS score_{lang}" for lang in lang_markers
    )
    return f"""
        {_DOC_BASE}
        SELECT doc_id,
               {score_cols},
               {pred} AS predicted_lang,
               round({best}, 6) AS lang_confidence
        FROM toked
    """


PII_AUGMENT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
    "CAST((doc_id * 7) % 256 AS VARCHAR) || ' ssn 123-45-6789 tel 555-123-4567'"
)


def text_pii_scrub_sql() -> str:
    """Mirror of operators/curation.py pii_scrub over the PII-augmented
    documents: each pattern's count is taken on the text after EARLIER
    patterns' replacements (the redactions actually performed),
    replacements chained in order."""
    from topnotch_spark.operators.curation import DEFAULT_PII_PATTERNS

    count_cols = []
    staged = "text"
    for name, regex, token in DEFAULT_PII_PATTERNS:
        count_cols.append(
            f"CAST(len(regexp_extract_all({staged}, $${regex}$$)) AS BIGINT)"
            f" AS n_{name}"
        )
        staged = f"regexp_replace({staged}, $${regex}$$, '{token}', 'g')"
    counts = ",\n               ".join(count_cols)
    return f"""
        WITH aug AS (
          SELECT doc_id, {PII_AUGMENT_SQL} AS text FROM documents
        )
        SELECT doc_id,
               {counts},
               {staged} AS clean_text
        FROM aug
    """


def text_quality_filter_sql(stopwords: list[str]) -> str:
    """Rule chain over the text_quality metrics — the rule strings come
    verbatim from curation.DEFAULT_QUALITY_FILTER_RULES (single source)."""
    from topnotch_spark.operators.curation import DEFAULT_QUALITY_FILTER_RULES

    cases = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END"
        for name, cond in DEFAULT_QUALITY_FILTER_RULES
    )
    return f"""
        SELECT doc_id, n_tokens, drop_reasons, drop_reasons = '' AS keep
        FROM (
          SELECT doc_id, n_tokens, concat_ws(',', {cases}) AS drop_reasons
          FROM ({text_quality_sql(stopwords)})
        )
    """


def sample_stratified_sql(rates: dict[str, float], default_rate: float = 0.0) -> str:
    """Mirror of curation.stratified_sample: md5-hex threshold per
    stratum (identical md5 hex on both engines ⇒ identical row set).
    NULL strata take the default rate (keyed as ''), as in the
    operator — the explicit IS NULL branch keeps NULL distinct from a
    ''-keyed rates entry."""
    from topnotch_spark.operators.curation import _rate_threshold_hex

    key = "substr(md5(coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 8)"
    whens = "\n               ".join(
        f"WHEN '{s}' THEN "
        + ("TRUE" if r >= 1.0 else f"{key} < '{_rate_threshold_hex(r)}'")
        for s, r in sorted(rates.items())
    )
    dflt = (
        "TRUE" if default_rate >= 1.0
        else f"{key} < '{_rate_threshold_hex(default_rate)}'"
    )
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE CASE WHEN lang IS NULL THEN {dflt}
              ELSE CASE lang
                    {whens}
                    ELSE {dflt}
                   END
              END
    """


def _ks_ecdf_tail_sql() -> str:
    """Shared ECDF-gap tail of the two KS oracles: integer
    cross-multiplied gap |cum_ref·n_cur − cum_cur·n_ref| (HUGEINT-exact
    in DuckDB, decimal-exact in Spark) with ONE double division at the
    end — mirrors drift.ks_statistic's arithmetic bit-for-bit. The outer
    n_ref/n_cur are CAST to BIGINT because DuckDB sum(BIGINT) yields
    HUGEINT, which pandas renders as float64 while Spark emits int64
    (the round-2 driver-gate red)."""
    return """
        ecdf AS (
          SELECT abs(sum(c_ref) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) * sum(c_cur) OVER ()
                     - sum(c_cur) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) * sum(c_ref) OVER ())
                     AS gap,
                 sum(c_ref) OVER () AS n_ref,
                 sum(c_cur) OVER () AS n_cur
          FROM per_v
        )
        SELECT CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
                    THEN round(CAST(max(gap) AS DOUBLE)
                               / (CAST(max(n_ref) AS DOUBLE)
                                  * CAST(max(n_cur) AS DOUBLE)), 6)
               END AS ks_stat,
               CAST(coalesce(max(n_ref), 0) AS BIGINT) AS n_ref,
               CAST(coalesce(max(n_cur), 0) AS BIGINT) AS n_cur
        FROM ecdf
    """


def drift_ks_sql(table: str, col: str, ref_predicate: str) -> str:
    """Mirror of operators/drift.py ks_statistic: distinct-value collapse,
    integer cross-multiplied ECDF gap in one ordered window, 1-row max."""
    return f"""
        WITH vals AS (
          SELECT CAST({col} AS DOUBLE) AS v,
                 CASE WHEN {ref_predicate} THEN 1 ELSE 0 END AS g
          FROM {table} WHERE {col} IS NOT NULL
        ),
        per_v AS (
          SELECT v,
                 CAST(sum(g) AS BIGINT) AS c_ref,
                 CAST(count(*) - sum(g) AS BIGINT) AS c_cur
          FROM vals GROUP BY v
        ),
        {_ks_ecdf_tail_sql()}
    """


def drift_ks_binned_sql(
    table: str, col: str, ref_predicate: str, bins: int
) -> str:
    """Binned-KS twin: same grid arithmetic as ks_statistic(bins=N) —
    width = (mx − mn)/bins over the REFERENCE side, clamp to edge bins.
    Division/floor order mirrors the Spark expressions so doubles match
    bit-for-bit."""
    return f"""
        WITH raw AS (
          SELECT CAST({col} AS DOUBLE) AS x,
                 CASE WHEN {ref_predicate} THEN 1 ELSE 0 END AS g
          FROM {table} WHERE {col} IS NOT NULL
        ),
        stats AS (
          SELECT min(x) AS mn, (max(x) - min(x)) / {bins} AS width
          FROM raw WHERE g = 1
        ),
        vals AS (
          SELECT CAST(least(greatest(floor((x - mn) / width), 0),
                            {bins - 1}) AS DOUBLE) AS v, g
          FROM raw, stats
        ),
        per_v AS (
          SELECT v,
                 CAST(sum(g) AS BIGINT) AS c_ref,
                 CAST(count(*) - sum(g) AS BIGINT) AS c_cur
          FROM vals GROUP BY v
        ),
        {_ks_ecdf_tail_sql()}
    """


def drift_wasserstein_sql(
    table: str, col: str, ref_predicate: str, bins: int
) -> str:
    """Mirror of drift.wasserstein_binned: 1-row (w1, w1_norm, n_ref,
    n_cur). Same grid arithmetic as the binned KS (reference min/max,
    clamp to edge bins), cumulative flows integer-exact via the
    cross-multiplication trick (HUGEINT here, decimal(38,0) in Spark),
    one double division at the end with the identical op order
    ``sum_gap / (n_ref · n_cur) · width``. The bucket spine comes from
    generate_series — empty bins carry the running gap."""
    return f"""
        WITH raw AS (
          SELECT CAST({col} AS DOUBLE) AS x,
                 CASE WHEN {ref_predicate} THEN 1 ELSE 0 END AS g
          FROM {table} WHERE {col} IS NOT NULL
        ),
        stats AS (
          SELECT min(x) AS mn, (max(x) - min(x)) / {bins} AS width
          FROM raw WHERE g = 1
        ),
        binned AS (
          SELECT CAST(least(greatest(floor((x - mn) / width), 0),
                            {bins - 1}) AS INT) AS bucket, g
          FROM raw, stats
        ),
        per_b AS (
          SELECT s.bucket,
                 CAST(coalesce(sum(g), 0) AS BIGINT) AS c_ref,
                 CAST(coalesce(count(binned.bucket) - sum(g), 0) AS BIGINT)
                   AS c_cur
          FROM (SELECT unnest(generate_series(0, {bins - 1})) AS bucket) s
          LEFT JOIN binned ON binned.bucket = s.bucket
          GROUP BY s.bucket
        ),
        ecdf AS (
          SELECT abs(sum(c_ref) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) * sum(c_cur) OVER ()
                     - sum(c_cur) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) * sum(c_ref) OVER ())
                     AS gap,
                 sum(c_ref) OVER () AS n_ref,
                 sum(c_cur) OVER () AS n_cur
          FROM per_b
        )
        SELECT CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
                    THEN round(CAST(sum(gap) AS DOUBLE)
                               / (CAST(max(n_ref) AS DOUBLE)
                                  * CAST(max(n_cur) AS DOUBLE))
                               * (SELECT width FROM stats), 6)
               END AS w1,
               CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
                    THEN round(CAST(sum(gap) AS DOUBLE)
                               / (CAST(max(n_ref) AS DOUBLE)
                                  * CAST(max(n_cur) AS DOUBLE))
                               / CAST({bins} AS DOUBLE), 6)
               END AS w1_norm,
               CAST(coalesce(max(n_ref), 0) AS BIGINT) AS n_ref,
               CAST(coalesce(max(n_cur), 0) AS BIGINT) AS n_cur
        FROM ecdf
    """


def groupwise_ks_sql(
    table: str,
    group_col: str,
    value_col: str,
    bins: int = 32,
    round_digits: int = 6,
) -> str:
    """Mirror of drift.groupwise_ks: global grid, per-(group, bucket)
    counts, complement reference, per-group integer ECDF gaps."""
    return f"""
        WITH vals AS (
          SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS x
          FROM {table} WHERE {value_col} IS NOT NULL
        ),
        stats AS (
          SELECT min(x) AS mn, (max(x) - min(x)) / {bins} AS width
          FROM vals
        ),
        cnt AS MATERIALIZED (
          SELECT g, CAST(least(greatest(floor((x - mn) / width), 0),
                               {bins - 1}) AS INT) AS bucket,
                 count(*) AS c_g
          FROM vals, stats GROUP BY 1, 2
        ),
        totals AS (SELECT bucket, sum(c_g) AS c_all FROM cnt GROUP BY 1),
        spine AS (
          SELECT gr.g, b.bucket,
                 CAST(coalesce(cnt.c_g, 0) AS BIGINT) AS c_cur,
                 CAST(coalesce(t.c_all, 0) - coalesce(cnt.c_g, 0)
                      AS BIGINT) AS c_ref
          FROM (SELECT DISTINCT g FROM cnt) gr
          CROSS JOIN (SELECT unnest(generate_series(0, {bins - 1}))
                        AS bucket) b
          LEFT JOIN cnt ON cnt.g = gr.g AND cnt.bucket = b.bucket
          LEFT JOIN totals t ON t.bucket = b.bucket
        ),
        ecdf AS (
          SELECT g,
                 abs(sum(c_ref) OVER (PARTITION BY g ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     * sum(c_cur) OVER (PARTITION BY g)
                     - sum(c_cur) OVER (PARTITION BY g ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     * sum(c_ref) OVER (PARTITION BY g)) AS gap,
                 sum(c_cur) OVER (PARTITION BY g) AS n_group,
                 sum(c_ref) OVER (PARTITION BY g) AS n_rest
          FROM spine
        )
        SELECT g AS {group_col},
               CAST(max(n_group) AS BIGINT) AS n_group,
               CAST(max(n_rest) AS BIGINT) AS n_rest,
               CASE WHEN max(n_group) > 0 AND max(n_rest) > 0
                    THEN round(CAST(max(gap) AS DOUBLE)
                               / (CAST(max(n_group) AS DOUBLE)
                                  * CAST(max(n_rest) AS DOUBLE)),
                               {round_digits})
               END AS ks_stat
        FROM ecdf GROUP BY g
    """


def drift_wasserstein_two_sql(
    table: str, col: str, ref_predicate: str, cur_predicate: str, bins: int
) -> str:
    """Two-independent-slices variant of drift_wasserstein_sql (rows may
    belong to both sides — e.g. the streaming monitor's ref=clicks vs
    cur=the whole stream): same grid, same integer cumulative flows."""
    return f"""
        WITH raw AS (
          SELECT CAST({col} AS DOUBLE) AS x, 1 AS is_ref, 0 AS is_cur
          FROM {table} WHERE ({ref_predicate}) AND {col} IS NOT NULL
          UNION ALL
          SELECT CAST({col} AS DOUBLE), 0, 1
          FROM {table} WHERE ({cur_predicate}) AND {col} IS NOT NULL
        ),
        stats AS (
          SELECT min(x) AS mn, (max(x) - min(x)) / {bins} AS width
          FROM raw WHERE is_ref = 1
        ),
        binned AS (
          SELECT CAST(least(greatest(floor((x - mn) / width), 0),
                            {bins - 1}) AS INT) AS bucket, is_ref, is_cur
          FROM raw, stats
        ),
        per_b AS (
          SELECT s.bucket,
                 CAST(coalesce(sum(is_ref), 0) AS BIGINT) AS c_ref,
                 CAST(coalesce(sum(is_cur), 0) AS BIGINT) AS c_cur
          FROM (SELECT unnest(generate_series(0, {bins - 1})) AS bucket) s
          LEFT JOIN binned ON binned.bucket = s.bucket
          GROUP BY s.bucket
        ),
        ecdf AS (
          SELECT abs(sum(c_ref) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) * sum(c_cur) OVER ()
                     - sum(c_cur) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) * sum(c_ref) OVER ())
                     AS gap,
                 sum(c_ref) OVER () AS n_ref,
                 sum(c_cur) OVER () AS n_cur
          FROM per_b
        )
        SELECT CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
                    THEN round(CAST(sum(gap) AS DOUBLE)
                               / (CAST(max(n_ref) AS DOUBLE)
                                  * CAST(max(n_cur) AS DOUBLE))
                               * (SELECT width FROM stats), 6)
               END AS w1,
               CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
                    THEN round(CAST(sum(gap) AS DOUBLE)
                               / (CAST(max(n_ref) AS DOUBLE)
                                  * CAST(max(n_cur) AS DOUBLE))
                               / CAST({bins} AS DOUBLE), 6)
               END AS w1_norm,
               CAST(coalesce(max(n_ref), 0) AS BIGINT) AS n_ref,
               CAST(coalesce(max(n_cur), 0) AS BIGINT) AS n_cur
        FROM ecdf
    """


def t_closeness_sql(
    table: str,
    quasi_exprs: dict[str, str],
    sensitive_col: str,
    t: float = 0.2,
    risky_only: bool = True,
) -> str:
    """Mirror of integrity.t_closeness: variational distance per quasi
    group via integer cross-multiplied cell terms plus the
    complement-mass term for sensitive values the group never exhibits;
    HUGEINT-exact with one double division. ``quasi_exprs`` maps output
    alias -> SQL expression."""
    qsel = ",\n                 ".join(
        f"{e} AS {a}" for a, e in quasi_exprs.items()
    )
    qcols = ", ".join(quasi_exprs)
    where = f"WHERE NOT (t_distance <= {t})" if risky_only else ""
    return f"""
        WITH cell AS (
          SELECT {qsel},
                 coalesce(CAST({sensitive_col} AS VARCHAR), '__NULL__') AS s,
                 count(*) AS n_gs
          FROM {table}
          GROUP BY ALL
        ),
        st AS (SELECT s, sum(n_gs) AS n_s FROM cell GROUP BY s),
        nt AS (SELECT sum(n_s) AS n_total FROM st),
        j AS (
          SELECT cell.*, st.n_s, nt.n_total,
                 sum(n_gs) OVER (PARTITION BY {qcols}) AS n_g
          FROM cell JOIN st USING (s), nt
        ),
        g AS (
          SELECT {qcols},
                 max(n_g) AS group_size,
                 max(n_total) AS n_total,
                 sum(abs(CAST(n_gs AS HUGEINT) * n_total
                         - CAST(n_s AS HUGEINT) * n_g)) AS term_sum,
                 sum(n_s) AS s_covered
          FROM j GROUP BY {qcols}
        ),
        scored AS (
          SELECT {qcols},
                 CAST(group_size AS BIGINT) AS group_size,
                 round(CAST(term_sum + (CAST(n_total AS HUGEINT) - s_covered)
                            * group_size AS DOUBLE)
                       / (2.0 * CAST(group_size AS DOUBLE)
                          * CAST(n_total AS DOUBLE)), 6) AS t_distance
          FROM g
        )
        SELECT {qcols}, group_size, t_distance,
               t_distance <= {t} AS meets_t
        FROM scored
        {where}
    """


def pack_token_shards_partitioned_sql(
    budget: int = 2000, partition_col: str = "source"
) -> str:
    """Mirror of curation.pack_token_shards(partition_col=...): prefix
    sums per partition — the parallel 100 TB path."""
    return f"""
        WITH toked AS (
          SELECT doc_id, {partition_col}, {tokens()} AS __t__ FROM documents
        )
        SELECT doc_id, {partition_col},
               CAST(len(__t__) AS BIGINT) AS n_tokens,
               CAST(floor(coalesce(sum(CAST(len(__t__) AS BIGINT))
                     OVER (PARTITION BY {partition_col} ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) / {budget}) AS BIGINT) AS shard_id
        FROM toked
    """


def pack_token_shards_sql(budget: int = 2000) -> str:
    """Mirror of curation.pack_token_shards (global ordered packing)."""
    return f"""
        {_DOC_BASE}
        SELECT doc_id,
               CAST(len(__t__) AS BIGINT) AS n_tokens,
               CAST(floor(coalesce(sum(CAST(len(__t__) AS BIGINT))
                     OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) / {budget}) AS BIGINT) AS shard_id
        FROM toked
    """


def text_repetition_sql(shingle_n: int = 3) -> str:
    """Mirror of textqc.repetition_stats: NON-distinct shingles via the
    token-slice formulation (RE2 has no lookahead; equivalence with the
    Spark regex extraction is established in dedup tests)."""
    parts = " || ' ' || ".join(f"__t__[i + {j}]" for j in range(shingle_n))
    raw_shingles = (
        f"list_transform(CASE WHEN len(__t__) >= {shingle_n} "
        f"THEN generate_series(1, len(__t__) - {shingle_n - 1}) "
        f"ELSE [] END, i -> {parts})"
    )
    return f"""
        {_DOC_BASE},
        sh AS (
          SELECT doc_id, __t__, {raw_shingles} AS __sh__ FROM toked
        )
        SELECT doc_id,
               CAST(len(__t__) AS INTEGER) AS n_tokens,
               CASE WHEN len(__t__) > 0
                    THEN round(1 - len(list_distinct(__t__)) * 1.0 / len(__t__), 6)
                    ELSE 0.0 END AS dup_token_frac,
               CAST(len(__sh__) AS INTEGER) AS n_shingles,
               CASE WHEN len(__sh__) > 0
                    THEN round(1 - len(list_distinct(__sh__)) * 1.0 / len(__sh__), 6)
                    ELSE 0.0 END AS dup_shingle_frac
        FROM sh
    """


def bpe_top_merges_sql(k: int = 50) -> str:
    """Mirror of textqc.bpe_top_merges: vocab counts, overlapping
    adjacent char pairs via generate_series, vocab-weighted pair sums.
    sum(BIGINT) is HUGEINT in DuckDB — cast back; rank is the Spark
    row_number int."""
    return f"""
        {_DOC_BASE},
        vocab AS (
          SELECT word, count(*) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          GROUP BY word
        ),
        pairs AS (
          SELECT unnest(list_transform(
                   generate_series(1, length(word) - 1),
                   i -> substr(word, i, 2))) AS pair,
                 wc
          FROM vocab WHERE length(word) >= 2
        ),
        counted AS (
          SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
          FROM pairs GROUP BY pair
          ORDER BY n_occurrences DESC, pair ASC
          LIMIT {k}
        )
        SELECT pair, n_occurrences,
               CAST(row_number() OVER (
                 ORDER BY n_occurrences DESC, pair ASC) AS INTEGER) AS rank
        FROM counted
    """


def collocations_sql(
    min_count: int = 5, k: int = 20, round_digits: int = 6
) -> str:
    """Mirror of textqc.collocations: unigram + adjacent-bigram counts,
    PMI on the exact integer ratio, top-k with the pair tiebreak."""
    return f"""
        {_DOC_BASE},
        uni AS (
          SELECT w, count(*) AS n_w
          FROM (SELECT unnest(__t__) AS w FROM toked)
          GROUP BY w
        ),
        tot AS (
          SELECT CAST(sum(len(__t__)) AS BIGINT) AS nt,
                 CAST(sum(greatest(len(__t__) - 1, 0)) AS BIGINT) AS nb
          FROM toked
        ),
        bi AS (
          SELECT left_token, right_token, count(*) AS n_pair
          FROM (
            SELECT unnest(list_transform(range(1, len(__t__)),
                     i -> struct_pack(l := __t__[i], r := __t__[i + 1])))
                   AS p
            FROM toked WHERE len(__t__) >= 2
          ), LATERAL (SELECT p.l AS left_token, p.r AS right_token)
          GROUP BY left_token, right_token
          HAVING count(*) >= {min_count}
        ),
        scored AS (
          SELECT b.left_token, b.right_token,
                 CAST(b.n_pair AS BIGINT) AS n_pair,
                 CAST(ul.n_w AS BIGINT) AS n_left,
                 CAST(ur.n_w AS BIGINT) AS n_right,
                 round(ln((CAST(b.n_pair AS DOUBLE) * t.nt * t.nt)
                          / (CAST(t.nb AS DOUBLE) * ul.n_w * ur.n_w)),
                       {round_digits}) AS pmi
          FROM bi b
          JOIN uni ul ON ul.w = b.left_token
          JOIN uni ur ON ur.w = b.right_token, tot t
        )
        SELECT left_token, right_token, n_pair, n_left, n_right, pmi,
               CAST(row_number() OVER (
                 ORDER BY pmi DESC, left_token ASC, right_token ASC)
                 AS INTEGER) AS rank
        FROM scored
        ORDER BY pmi DESC, left_token ASC, right_token ASC
        LIMIT {k}
    """


def bpe_fertility_sql(n_merges: int = 8, group_col: str = "source") -> str:
    """Mirror of textqc.bpe_fertility_by_group: the same chained merge
    rounds carrying the word key, then one corpus-tokens → final-vocab
    join and per-group integer sums. Sentinel padding matches the
    operator (an exhausted corpus keeps an identity state)."""
    rounds = []
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        rounds.append(f"""
        p{r} AS (
          SELECT pair, CAST(sum(wc) AS BIGINT) AS n
          FROM (
            SELECT unnest(list_transform(range(1, len(syms)),
                     i -> syms[i] || ' ' || syms[i + 1])) AS pair, wc
            FROM (SELECT list_filter(string_split(s, '  '),
                           x -> x <> '') AS syms, wc
                  FROM {prev})
          ) GROUP BY pair
        ),
        b{r} AS (
          SELECT pair FROM (
            SELECT pair, n FROM p{r}
            UNION ALL SELECT chr(1) || ' ' || chr(1), -1
          ) ORDER BY n DESC, pair ASC LIMIT 1
        ),
        s{r} AS (
          SELECT word,
                 replace(s,
                   ' ' || split_part(pair, ' ', 1) || '  '
                       || split_part(pair, ' ', 2) || ' ',
                   ' ' || split_part(pair, ' ', 1)
                       || split_part(pair, ' ', 2) || ' ') AS s,
                 wc
          FROM {prev}, b{r}
        )""")
    return f"""
        {_DOC_BASE},
        vocab AS (
          SELECT word, count(*) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          GROUP BY word
        ),
        s0 AS (
          SELECT word,
                 ' ' || regexp_replace(word, '(.)', ' \\1 ', 'g') || ' '
                   AS s,
                 wc
          FROM vocab
        ),
        {",".join(rounds)},
        word_sub AS (
          SELECT word,
                 CAST(len(list_filter(string_split(s, '  '),
                          x -> x <> '')) AS BIGINT) AS nsub,
                 CAST(length(word) AS BIGINT) AS nchr
          FROM s{n_merges}
        ),
        tok AS (
          SELECT d.{group_col} AS grp, unnest({tokens()}) AS word
          FROM documents d
        )
        SELECT grp AS {group_col},
               count(*) AS n_tokens,
               CAST(sum(nsub) AS BIGINT) AS n_subwords,
               round(CAST(sum(nsub) AS DOUBLE) / count(*), 6) AS fertility,
               round(CAST(sum(nchr) AS DOUBLE) / sum(nsub), 6)
                 AS chars_per_subword
        FROM tok JOIN word_sub USING (word)
        GROUP BY grp
    """


def bpe_merge_sequence_sql(n_merges: int = 8) -> str:
    """Mirror of textqc.bpe_merge_sequence: ``n_merges`` chained CTE
    rounds of pair-count → top-1 → greedy merge-apply, on the SAME
    doubled-space string representation — DuckDB's replace() shares
    Spark's continue-after-replacement scan, so the greedy non-overlap
    semantics match bit-for-bit."""
    rounds = []
    union = []
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        rounds.append(f"""
        p{r} AS (
          SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
          FROM (
            SELECT unnest(list_transform(range(1, len(syms)),
                     i -> syms[i] || ' ' || syms[i + 1])) AS pair, wc
            FROM (SELECT list_filter(string_split(s, '  '),
                           x -> x <> '') AS syms, wc
                  FROM {prev})
          ) GROUP BY pair
        ),
        b{r} AS (
          SELECT {r} AS merge_rank, pair, n_occurrences
          FROM p{r} ORDER BY n_occurrences DESC, pair ASC LIMIT 1
        ),
        s{r} AS (
          SELECT replace(s,
                   ' ' || split_part(pair, ' ', 1) || '  '
                       || split_part(pair, ' ', 2) || ' ',
                   ' ' || split_part(pair, ' ', 1)
                       || split_part(pair, ' ', 2) || ' ') AS s,
                 wc
          FROM {prev}, b{r}
        )""")
        union.append(f"SELECT * FROM b{r}")
    return f"""
        {_DOC_BASE},
        vocab AS (
          SELECT word, count(*) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          GROUP BY word
        ),
        s0 AS (
          SELECT ' ' || regexp_replace(word, '(.)', ' \\1 ', 'g') || ' '
                   AS s,
                 wc
          FROM vocab
        ),
        {",".join(rounds)}
        SELECT CAST(merge_rank AS INTEGER) AS merge_rank,
               split_part(pair, ' ', 1) AS lhs,
               split_part(pair, ' ', 2) AS rhs,
               split_part(pair, ' ', 1) || split_part(pair, ' ', 2)
                 AS merged,
               n_occurrences
        FROM ({" UNION ALL ".join(union)})
        ORDER BY merge_rank
    """


def bpe_segment_sql(n_merges: int = 8, round_digits: int = 6) -> str:
    """Mirror of catalog.bpe_segment_docs: train ``n_merges`` BPE
    rounds inline (the bpe_fertility_sql chained-round prefix, word key
    carried through), then roll the final per-word subword counts up
    PER DOCUMENT — the oracle replays train → apply end to end, and
    replaying the rounds on the training corpus equals folding the
    emitted merge list over it (the engine's apply path). Sentinel
    padding matches the operator (an exhausted corpus keeps an
    identity state, which the engine-side merge list simply omits)."""
    rounds = []
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        rounds.append(f"""
        p{r} AS (
          SELECT pair, CAST(sum(wc) AS BIGINT) AS n
          FROM (
            SELECT unnest(list_transform(range(1, len(syms)),
                     i -> syms[i] || ' ' || syms[i + 1])) AS pair, wc
            FROM (SELECT list_filter(string_split(s, '  '),
                           x -> x <> '') AS syms, wc
                  FROM {prev})
          ) GROUP BY pair
        ),
        b{r} AS (
          SELECT pair FROM (
            SELECT pair, n FROM p{r}
            UNION ALL SELECT chr(1) || ' ' || chr(1), -1
          ) ORDER BY n DESC, pair ASC LIMIT 1
        ),
        s{r} AS (
          SELECT word,
                 replace(s,
                   ' ' || split_part(pair, ' ', 1) || '  '
                       || split_part(pair, ' ', 2) || ' ',
                   ' ' || split_part(pair, ' ', 1)
                       || split_part(pair, ' ', 2) || ' ') AS s,
                 wc
          FROM {prev}, b{r}
        )""")
    return f"""
        {_DOC_BASE},
        vocab AS (
          SELECT word, count(*) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          GROUP BY word
        ),
        s0 AS (
          SELECT word,
                 ' ' || regexp_replace(word, '(.)', ' \\1 ', 'g') || ' '
                   AS s,
                 wc
          FROM vocab
        ),
        {",".join(rounds)},
        word_sub AS (
          SELECT word,
                 CAST(len(list_filter(string_split(s, '  '),
                          x -> x <> '')) AS BIGINT) AS nsub
          FROM s{n_merges}
        ),
        tok AS (SELECT doc_id, unnest(__t__) AS word FROM toked),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(nsub) AS BIGINT) AS n_subwords
          FROM tok JOIN word_sub USING (word)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(per.n_tokens, 0) AS n_tokens,
               coalesce(per.n_subwords, 0) AS n_subwords,
               CASE WHEN per.n_tokens > 0
                    THEN round(per.n_subwords * 1.0 / per.n_tokens,
                               {round_digits})
               END AS fertility
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


def text_novelty_sql(shingle_n: int = 3, round_digits: int = 6) -> str:
    """Mirror of textqc.ngram_novelty: distinct shingles per doc,
    corpus document frequency per shingle, per-doc share with df = 1.
    count(*) FILTER keeps both counters BIGINT (DuckDB sum(int) would
    be HUGEINT — the round-2 strict-hash lesson)."""
    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (SELECT id, __sh__ FROM shingled WHERE len(__sh__) > 0),
        ex AS (SELECT id, unnest(__sh__) AS sh FROM base),
        dfc AS (SELECT sh, count(*) AS dfreq FROM ex GROUP BY sh)
        SELECT ex.id AS doc_id,
               count(*) AS n_shingles,
               count(*) FILTER (WHERE dfreq = 1) AS n_novel,
               round(count(*) FILTER (WHERE dfreq = 1) * 1.0 / count(*),
                     {round_digits}) AS novelty_rate
        FROM ex JOIN dfc USING (sh)
        GROUP BY ex.id
    """


def corpus_diversity_sql(
    table: str = "documents",
    group_col: str = "source",
    cat_col: str = "lang",
    round_digits: int = 6,
) -> str:
    """Mirror of curation.corpus_diversity. Window sum(BIGINT) is
    HUGEINT in DuckDB — cast back to BIGINT so n_rows hashes like
    Spark's bigint (the round-2 lesson); rank ties are broken
    (count asc, category asc) exactly like the Spark window."""
    return f"""
        WITH counts AS (
          SELECT {group_col} AS grp, {cat_col} AS cat, count(*) AS n
          FROM {table} GROUP BY 1, 2
        ),
        win AS (
          SELECT grp, cat, n,
                 CAST(sum(n) OVER (PARTITION BY grp) AS BIGINT) AS tot,
                 count(*) OVER (PARTITION BY grp) AS k,
                 row_number() OVER (
                   PARTITION BY grp ORDER BY n ASC, cat ASC
                 ) AS rnk
          FROM counts
        )
        SELECT grp AS {group_col},
               max(tot) AS n_rows,
               count(*) AS n_cats,
               round(0.0 - sum((n * 1.0 / tot) * log2(n * 1.0 / tot)),
                     {round_digits}) AS shannon_bits,
               round(1.0 - sum((n * 1.0 / tot) * (n * 1.0 / tot)),
                     {round_digits}) AS simpson,
               round(sum((2 * rnk - k - 1) * n) * 1.0
                     / (max(k) * max(tot)), {round_digits}) AS gini
        FROM win
        GROUP BY grp
    """


def latest_event_per_user_sql() -> str:
    return """
        WITH ranked AS (
          SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
                 value,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ) AS rn
          FROM events
        )
        SELECT event_id, ts, user_id, event_type, value
        FROM ranked WHERE rn = 1
    """


def outliers_zscore_sql(
    table: str, col: str, group_cols: list[str], keep_cols: list[str],
    k: float = 3.0,
) -> str:
    part = ", ".join(group_cols) if group_cols else ""
    over = f"PARTITION BY {part}" if part else ""
    keep = ", ".join(keep_cols)
    return f"""
        WITH stats AS (
          SELECT {keep},
                 avg({col}) OVER ({over}) AS m,
                 stddev_samp({col}) OVER ({over}) AS s
          FROM {table}
        )
        SELECT {keep},
               CASE WHEN s > 0 THEN round(({col} - m) / s, 6)
                    ELSE 0.0 END AS zscore,
               abs(CASE WHEN s > 0 THEN round(({col} - m) / s, 6)
                        ELSE 0.0 END) > {k} AS is_outlier
        FROM stats
    """


def sample_stratified_topn_sql(n: int) -> str:
    """Mirror of curation.stratified_topn: md5 pseudo-random order
    (NULL strata keyed as '', partitioned as their own group),
    row_number ≤ n per stratum."""
    return f"""
        WITH ranked AS (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(coalesce(lang, '') || ':'
                               || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        )
        SELECT doc_id, lang FROM ranked WHERE rn <= {n}
    """


def text_tfidf_keywords_sql(k: int = 3) -> str:
    """Mirror of textqc.tfidf_keywords; N is a scalar subquery (the
    Spark side uses the same count as a literal)."""
    return f"""
        {_DOC_BASE},
        tok AS (SELECT doc_id, unnest(__t__) AS token FROM toked),
        tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, token
        ),
        dfreq AS (
          SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY token
        ),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0
                                  / dfreq.df_t), 6) AS tfidf
          FROM tf JOIN dfreq USING (token)
        ),
        ranked AS (
          SELECT doc_id, token, tfidf,
                 CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
                 ) AS INTEGER) AS rank
          FROM scored
        )
        SELECT doc_id, token, tfidf, rank FROM ranked WHERE rank <= {k}
    """


def text_normalize_sql() -> str:
    """Mirror of curation.normalize_text (regexes are Java ∩ RE2, run
    verbatim; lengths cast to Spark's int)."""
    norm = (
        "lower(trim(regexp_replace(regexp_replace(text, "
        "'[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')))"
    )
    return f"""
        SELECT doc_id,
               {norm} AS norm_text,
               CAST(length(text) AS INTEGER) AS n_chars_raw,
               CAST(length({norm}) AS INTEGER) AS n_chars_norm,
               {norm} <> text AS changed
        FROM documents
    """


def fd_check_sql(
    table: str,
    pairs: list,
    round_digits: int = 6,
) -> str:
    """Mirror of integrity.fd_check: per (determinant, dependent) pair
    one summary row from a groupBy + sentinel count-distinct."""
    parts = []
    for det, dep in pairs:
        parts.append(f"""
        SELECT '{det}' AS determinant, '{dep}' AS dependent,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violating,
               CASE WHEN count(*) > 0
                 THEN round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                                 AS DOUBLE) / CAST(count(*) AS DOUBLE),
                            {round_digits}) END AS violation_frac,
               coalesce(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) = 0
                 AS holds
        FROM (
          SELECT {det},
                 count(DISTINCT coalesce(CAST({dep} AS VARCHAR),
                                         '__NULL__')) AS nd
          FROM {table} GROUP BY {det}
        )""")
    return "\nUNION ALL\n".join(parts)


def fk_integrity_sql(
    relations: list[tuple[str, str, str, str, str]],
) -> str:
    """Mirror of integrity.referential_integrity_suite over
    (name, child_table, fk_col, parent_table, pk_col) relations. NULL
    FKs opt out of the constraint (counted separately); HUGEINT-risk
    sums are cast to BIGINT."""
    parts = []
    for name, child, fk, parent, pk in relations:
        orphan = (
            f"CASE WHEN c.{fk} IS NOT NULL AND NOT EXISTS "
            f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}) "
            f"THEN 1 ELSE 0 END"
        )
        parts.append(f"""
          SELECT '{name}' AS relation,
                 count(*) AS n_child,
                 CAST(sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_null_fk,
                 CAST(sum({orphan}) AS BIGINT) AS n_orphans,
                 round(sum({orphan}) * 1.0 / count(*), 6) AS orphan_frac
          FROM {child} c""")
    return "\n          UNION ALL\n".join(parts)


def salt_plan_sql(
    table: str,
    key: str,
    target: int = 600,
    max_salt: int = 4,
    round_digits: int = 6,
) -> str:
    """Mirror of skew.salt_plan: exact integer ceil via (n + t − 1) // t
    and the max_salt cap, violating keys only."""
    return f"""
        WITH counts AS (
          SELECT {key}, count(*) AS n_rows FROM {table} GROUP BY {key}
        ),
        tot AS (SELECT sum(n_rows) AS total FROM counts)
        SELECT {key}, n_rows,
               round(CAST(n_rows AS DOUBLE) / CAST(tot.total AS DOUBLE),
                     {round_digits}) AS frac,
               CAST(least((n_rows + {target - 1}) // {target},
                          {max_salt}) AS BIGINT) AS salt_factor
        FROM counts, tot
        WHERE n_rows > {target}
    """


def key_skew_topk_sql(table: str, key: str, k: int = 10) -> str:
    """Mirror of skew.key_skew_topk for a single key column."""
    return f"""
        WITH counts AS (
          SELECT {key}, CAST(count(*) AS BIGINT) AS n_rows
          FROM {table} GROUP BY {key}
        ),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM counts),
        top AS (
          SELECT {key}, n_rows FROM counts
          ORDER BY n_rows DESC, {key} ASC LIMIT {k}
        )
        SELECT {key}, n_rows,
               round(n_rows * 1.0 / total, 6) AS frac,
               CAST(row_number() OVER (ORDER BY n_rows DESC, {key} ASC)
                    AS INTEGER) AS rank
        FROM top CROSS JOIN tot
    """


def dedup_containment_sql(
    threshold: float = 0.5,
    shingle_n: int = 5,
    max_shingle_df: int | None = 1000,
) -> str:
    """Mirror of dedup.containment_pairs: DIRECTED pairs, score =
    |A∩B| / |A|, same join-only DF valve as the Jaccard twin."""
    df_filter = (
        f"""joinable AS (
          SELECT shingle FROM ex GROUP BY shingle
          HAVING count(*) <= {max_shingle_df}
        ),
        exj AS (SELECT ex.id, ex.shingle FROM ex JOIN joinable USING (shingle))"""
        if max_shingle_df is not None
        else "exj AS (SELECT id, shingle FROM ex)"
    )
    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (SELECT id, __sh__ FROM shingled WHERE len(__sh__) > 0),
        sizes AS (SELECT id, len(__sh__) AS n_sh FROM base),
        ex AS (SELECT id, unnest(__sh__) AS shingle FROM base),
        {df_filter},
        common AS (
          SELECT a.id AS id_1, b.id AS id_2, CAST(count(*) AS BIGINT) AS n_common
          FROM exj a JOIN exj b ON a.shingle = b.shingle
          WHERE a.id <> b.id
          GROUP BY 1, 2
        )
        SELECT id_1, id_2, n_common,
               CAST(s1.n_sh AS INTEGER) AS size_1,
               round(n_common * 1.0 / s1.n_sh, 6) AS containment
        FROM common JOIN sizes s1 ON id_1 = s1.id
        WHERE round(n_common * 1.0 / s1.n_sh, 6) >= {threshold}
    """


def embedding_quantize_sql() -> str:
    """Mirror of similarity.quantize_embeddings: symmetric per-vector
    int8 SQ with floor(x + 0.5) rounding (round-half rules are engine-
    specific; floor is not) and 0-based pos."""
    return """
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
          FROM embeddings
        ),
        s AS (
          SELECT vec_id, vd,
                 list_max(list_transform(vd, x -> abs(x))) / 127.0 AS scale
          FROM v
        ),
        ex AS (
          SELECT vec_id, scale, unnest(vd) AS val,
                 unnest(generate_series(1, len(vd))) AS pos
          FROM s
        )
        SELECT vec_id,
               CAST(pos - 1 AS INTEGER) AS pos,
               CAST(CASE WHEN scale > 0
                    THEN least(greatest(floor(val / scale + 0.5), -127), 127)
                    ELSE 0 END AS INTEGER) AS q,
               round(scale, 9) AS scale
        FROM ex
    """


def cross_corpus_overlap_sql(
    bench_sources: list[str],
    shingle_n: int = 5,
    min_common: int = 1,
    max_shingle_df: int | None = 10_000,
) -> str:
    """Mirror of curation.cross_corpus_overlap over a source-based split
    of the documents table (bench = listed sources, corpus = the rest),
    including the corpus-side document-frequency valve."""
    srcs = ", ".join(f"'{s}'" for s in bench_sources)
    c_valve = (
        f"""c_raw AS (
          SELECT doc_id AS corpus_id, unnest(__sh__) AS sh
          FROM base WHERE source NOT IN ({srcs})
        ),
        joinable AS (
          SELECT sh FROM c_raw GROUP BY sh
          HAVING count(*) <= {max_shingle_df}
        ),
        c AS (SELECT corpus_id, sh FROM c_raw JOIN joinable USING (sh))"""
        if max_shingle_df is not None
        else f"""c AS (
          SELECT doc_id AS corpus_id, unnest(__sh__) AS sh
          FROM base WHERE source NOT IN ({srcs})
        )"""
    )
    return f"""
        WITH toked AS (
          SELECT doc_id, source, {tokens()} AS __t__ FROM documents
        ),
        shingled AS (
          SELECT doc_id, source, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        base AS (
          SELECT doc_id, source, __sh__ FROM shingled WHERE len(__sh__) > 0
        ),
        {c_valve},
        b AS (
          SELECT doc_id AS bench_id, len(__sh__) AS bench_size,
                 unnest(__sh__) AS sh
          FROM base WHERE source IN ({srcs})
        ),
        pairs AS (
          SELECT corpus_id, bench_id, bench_size,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM c JOIN b USING (sh)
          GROUP BY corpus_id, bench_id, bench_size
        )
        SELECT corpus_id, bench_id, n_common,
               round(n_common * 1.0 / bench_size, 6) AS overlap_frac
        FROM pairs WHERE n_common >= {min_common}
    """


def text_vocab_topk_sql(k: int = 50) -> str:
    return f"""
        {_DOC_BASE},
        tok AS (SELECT doc_id, unnest(__t__) AS token FROM toked),
        stats AS (
          SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
          FROM tok GROUP BY token
        )
        SELECT token, n_total, n_docs FROM stats
        ORDER BY n_total DESC, token LIMIT {k}
    """


def embedding_centroids_sql(round_digits: int = 6) -> str:
    """Mirror of the flattened embedding_centroids catalog query
    (parallel unnests zip in DuckDB; pos re-based to Spark posexplode's
    0-based int)."""
    return f"""
        WITH ex AS (
          SELECT label, unnest(embedding) AS val,
                 unnest(generate_series(1, len(embedding))) AS pos
          FROM embeddings
        ),
        per_dim AS (
          SELECT label, pos, sum(CAST(val AS DOUBLE)) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM ex GROUP BY label, pos
        )
        SELECT label, n AS n_vectors,
               CAST(pos - 1 AS INTEGER) AS pos,
               round(s / n, {round_digits}) AS value
        FROM per_dim
    """


def streaming_error_click_join_sql(tolerance_seconds: int = 3600) -> str:
    """Batch twin of the stream-stream range join: every (error, click)
    pair per user with the click in [error_ts − tolerance, error_ts]."""
    tol_us = tolerance_seconds * 1_000_000
    return f"""
        WITH b AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events
        )
        SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id,
               epoch_us(e.ts) - epoch_us(c.ts) AS lag_us
        FROM b e JOIN b c
          ON e.user_id = c.user_id
         AND c.ts <= e.ts
         AND epoch_us(e.ts) - epoch_us(c.ts) <= {tol_us}
        WHERE e.event_type = 'error' AND c.event_type = 'click'
    """


def events_json_props_sql() -> str:
    """Mirror of catalog.events_json_props (DuckDB JSON extension)."""
    return """
        WITH parsed AS (
          SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events
        )
        SELECT event_type,
               count(*) AS n_events,
               -- DuckDB sum(BIGINT) is HUGEINT -> pandas float64; Spark
               -- emits int64 — CAST keeps the driver's dtype-aware hash green
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k,
               max(k) AS max_k,
               round(sum(k) * 1.0 / count(*), 6) AS avg_k
        FROM parsed GROUP BY event_type
    """


def timeseries_resample_sql(bucket_days: int = 1) -> str:
    """Mirror of temporal.resample_timeseries: time_bucket == Spark's
    window().start for epoch-anchored day buckets; dense spine from
    generate_series over the observed bucket range."""
    iv = f"INTERVAL {bucket_days} DAY"
    return f"""
        WITH base AS (
          SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        ),
        per AS (
          SELECT time_bucket({iv}, ts) AS bucket_start, event_type,
                 CAST(count(*) AS BIGINT) AS n_events,
                 round(sum(value), 6) AS sum_value
          FROM base GROUP BY 1, 2
        ),
        bounds AS (
          SELECT min(time_bucket({iv}, ts)) AS mn,
                 max(time_bucket({iv}, ts)) AS mx
          FROM base
        ),
        buckets AS (
          SELECT unnest(generate_series(mn, mx, {iv})) AS bucket_start
          FROM bounds
        ),
        spine AS (
          SELECT b.bucket_start, t.event_type
          FROM buckets b, (SELECT DISTINCT event_type FROM base) t
        )
        SELECT s.bucket_start, s.event_type,
               coalesce(p.n_events, 0) AS n_events,
               coalesce(p.sum_value, 0.0) AS sum_value
        FROM spine s LEFT JOIN per p
          ON s.bucket_start = p.bucket_start AND s.event_type = p.event_type
    """


def asof_error_click_sql() -> str:
    """Native DuckDB ASOF LEFT JOIN mirrors the Spark merge-sorted as-of
    (equality matches; clicks pre-deduped per (user, ts) by max event_id
    in BOTH engines so ties are engine-independent)."""
    return """
        WITH e AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'error'
        ),
        c0 AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
                 row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                   ORDER BY event_id DESC
                 ) AS rn
          FROM events WHERE event_type = 'click'
        ),
        c AS (SELECT user_id, ts, event_id, value FROM c0 WHERE rn = 1)
        SELECT e.event_id, e.user_id, e.ts, e.value,
               c.ts AS ts_click,
               c.event_id AS event_id_click,
               c.value AS value_click
        FROM e ASOF LEFT JOIN c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """


def range_join_events_sql(tolerance_seconds: int = 3600) -> str:
    """Plain inequality self-join (DuckDB's IEJoin handles it); the Spark
    side gets the same rows via bucket banding."""
    tol_us = tolerance_seconds * 1_000_000
    return f"""
        WITH b AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        )
        SELECT a.user_id,
               a.event_id AS id_a,
               b.event_id AS id_b,
               a.ts AS ts_a,
               b.ts AS ts_b,
               (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS dt_seconds
        FROM b a JOIN b b
          ON a.user_id = b.user_id
         AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
         AND epoch_us(b.ts) - epoch_us(a.ts) <= {tol_us}
    """


def multimodal_blob_dedup_sql() -> str:
    """md5 over raw bytes: DuckDB's md5(VARCHAR) hashes the string's
    UTF-8 bytes — exactly the bytes Spark hashes after
    ``encode(text, 'UTF-8')``, so no BLOB cast is needed (DuckDB has no
    md5(BLOB) overload)."""
    return """
        SELECT doc_id,
               md5(text) AS blob_key,
               count(*) OVER (PARTITION BY md5(text)) AS group_size,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM documents
    """


def multimodal_byte_stats_sql(bins: int = 16) -> str:
    """Mirror of operators/multimodal.byte_stats over encode(text):
    high-nibble counts come from the odd positions of hex(blob) (exact
    integers); entropy re-derives from those counts with the same
    ascending-bin accumulation order, so doubles match bit-for-bit."""
    digits = "0123456789ABCDEF"
    hist_cols = ",\n               ".join(
        f"len(list_filter(hx_digits, d -> d = '{digits[i]}')) AS h{i}"
        for i in range(bins)
    )
    ent_terms = " + ".join(
        f"(CASE WHEN h{i} > 0 THEN -(h{i} * 1.0 / size_bytes) * "
        f"log2(h{i} * 1.0 / size_bytes) ELSE 0.0 END)"
        for i in range(bins)
    )
    return f"""
        WITH blobs AS (
          SELECT doc_id, encode(text) AS b FROM documents
        ),
        hexed AS (
          SELECT doc_id, octet_length(b) AS size_bytes,
                 list_transform(generate_series(1, octet_length(b)),
                                k -> substr(hex(b), 2*k - 1, 1)) AS hx_digits
          FROM blobs
        ),
        histo AS (
          SELECT doc_id, size_bytes,
               {hist_cols}
          FROM hexed
        )
        SELECT doc_id, size_bytes,
               {', '.join(f'h{i}' for i in range(bins))},
               round({ent_terms}, 6) AS nibble_entropy
        FROM histo
    """


def kmv_accuracy_sql(
    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 256,
    salt: str = "kmv",
    round_digits: int = 6,
) -> str:
    """Mirror of sketch.kmv_accuracy over lineitem.l_extendedprice:
    identical md5 bottom-k sample, identical ceil-rank estimate pick,
    identical unrounded within_bound comparison. count(*) FILTER keeps
    est_rank BIGINT; q literals cast to DOUBLE (unnest of bare decimals
    would be DECIMAL)."""
    bound = 3.0 / (k ** 0.5)
    q_list = ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
    return f"""
        WITH vals AS (
          SELECT CAST(l_orderkey AS VARCHAR) || '#' ||
                 CAST(l_linenumber AS VARCHAR) AS id,
                 CAST(l_extendedprice AS DOUBLE) AS value
          FROM lineitem
        ),
        sk AS (
          -- (h, value) tie order mirrors sketch.kmv_build: duplicate ids
          -- hash identically with different values, and the bottom-k
          -- boundary must cut tie groups the same way in every engine
          SELECT value, md5('{salt}:' || id) AS h
          FROM vals ORDER BY md5('{salt}:' || id), value LIMIT {k}
        ),
        ranked AS (
          SELECT value,
                 row_number() OVER (ORDER BY value ASC, h ASC) AS rn,
                 count(*) OVER () AS n_sample
          FROM sk
        ),
        qs AS (SELECT unnest([{q_list}]) AS q),
        ests AS (
          SELECT q, n_sample, value AS est
          FROM qs JOIN ranked
            ON CAST(ceil(q * n_sample) AS BIGINT) = rn
        ),
        tot AS (SELECT count(*) AS n_total FROM vals),
        graded AS (
          SELECT q, n_sample, est,
                 count(*) FILTER (WHERE value <= est) AS est_rank
          FROM vals CROSS JOIN ests
          GROUP BY q, n_sample, est
        )
        SELECT q,
               (SELECT n_total FROM tot) AS n_total,
               n_sample, est, est_rank,
               CAST(ceil(q * (SELECT n_total FROM tot)) AS BIGINT)
                 AS target_rank,
               round(abs(est_rank * 1.0 / (SELECT n_total FROM tot) - q),
                     {round_digits}) AS rank_err,
               (abs(est_rank * 1.0 / (SELECT n_total FROM tot) - q)
                 <= {bound}) AS within_bound
        FROM graded
    """


def cms_heavy_hitters_sql(
    width: int = 1024, depth: int = 4, k: int = 10
) -> str:
    """Mirror of catalog.cms_heavy_hitters: identical double-hashed
    (row, col) cells over md5(CAST(o_custkey AS VARCHAR)), exact top-k
    keys with a deterministic tiebreak, estimate = min probed cell."""
    h1 = "('0x' || substr(md5(key), 1, 15))::BIGINT"
    h2 = "(('0x' || substr(md5(key), 16, 15))::BIGINT * 2 + 1)"
    return f"""
        WITH keyed AS (
          SELECT CAST(o_custkey AS VARCHAR) AS key FROM orders
        ),
        cells AS (
          SELECT j AS row_idx,
                 (({h1}) + j * ({h2})) % {width} AS col_idx,
                 count(*) AS cnt
          FROM keyed, unnest(generate_series(0, {depth - 1})) AS t(j)
          GROUP BY 1, 2
        ),
        top AS (
          SELECT o_custkey, count(*) AS exact_count
          FROM orders GROUP BY o_custkey
          ORDER BY exact_count DESC, o_custkey ASC LIMIT {k}
        ),
        probes AS (
          SELECT o_custkey, exact_count, j,
                 (({h1}) + j * ({h2})) % {width} AS col_idx
          FROM (SELECT o_custkey, exact_count,
                       CAST(o_custkey AS VARCHAR) AS key FROM top) tp,
               unnest(generate_series(0, {depth - 1})) AS t(j)
        ),
        est AS (
          SELECT p.o_custkey, p.exact_count,
                 min(coalesce(c.cnt, 0)) AS est_count
          FROM probes p
          LEFT JOIN cells c ON c.row_idx = p.j AND c.col_idx = p.col_idx
          GROUP BY p.o_custkey, p.exact_count
        )
        SELECT o_custkey, exact_count, est_count,
               est_count - exact_count AS overestimate
        FROM est
    """


def cms_join_size_sql(
    t1: str,
    k1: str,
    t2: str,
    k2: str,
    width: int = 1024,
    depth: int = 4,
    round_digits: int = 6,
) -> str:
    """Mirror of sketch.cms_join_size: identical double-hashed CMS cells
    for both sides, per-row inner products, min over the depth spine,
    exact per-key counts join for grading."""
    h1 = "('0x' || substr(md5(key), 1, 15))::BIGINT"
    h2 = "(('0x' || substr(md5(key), 16, 15))::BIGINT * 2 + 1)"

    def cells(src: str) -> str:
        return f"""
          SELECT j AS row_idx,
                 (({h1}) + j * ({h2})) % {width} AS col_idx,
                 count(*) AS cnt
          FROM {src}, unnest(generate_series(0, {depth - 1})) AS t(j)
          GROUP BY 1, 2
        """

    return f"""
        WITH ka AS (SELECT CAST({k1} AS VARCHAR) AS key FROM {t1}),
        kb AS (SELECT CAST({k2} AS VARCHAR) AS key FROM {t2}),
        ca AS ({cells('ka')}),
        cb AS ({cells('kb')}),
        ip AS (
          SELECT ca.row_idx, sum(ca.cnt * cb.cnt) AS ip
          FROM ca JOIN cb USING (row_idx, col_idx)
          GROUP BY 1
        ),
        est AS (
          SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS est_join_size
          FROM (SELECT unnest(generate_series(0, {depth - 1})) AS row_idx) s
          LEFT JOIN ip USING (row_idx)
        ),
        exact AS (
          SELECT CAST(coalesce(sum(ga.c * gb.c), 0) AS BIGINT)
            AS exact_join_size
          FROM (SELECT key, count(*) AS c FROM ka GROUP BY key) ga
          JOIN (SELECT key, count(*) AS c FROM kb GROUP BY key) gb
            USING (key)
        )
        SELECT est_join_size, exact_join_size,
               est_join_size - exact_join_size AS overestimate,
               CASE WHEN exact_join_size > 0
                 THEN round(CAST(est_join_size - exact_join_size AS DOUBLE)
                            / CAST(exact_join_size AS DOUBLE),
                            {round_digits}) END AS rel_err
        FROM est, exact
    """


def retrieval_rrf_sql(
    queries: list[tuple[int, str]],
    dim: int = 64,
    k: int = 10,
    rrf_k: int = 60,
    topk: int = 10,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.retrieval_rrf_fused: the bm25_topk oracle as a
    parenthesized subquery (its own WITH nests fine in DuckDB), a dense
    cosine top-k over the same query ids, then the identical nano-unit
    integer RRF sum and exact-integer fused ranking."""
    ids = ", ".join(str(qid) for qid, _ in queries)
    return f"""
        WITH bm AS (
          SELECT query_id, doc_id, rank
          FROM ({bm25_topk_sql(queries, k=k)}) t
        ),
        q AS (
          SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id IN ({ids})
        ),
        dpairs AS (
          SELECT q.query_id, c.vec_id AS doc_id,
                 round({cosine('q.qv', 'c.embedding', dim)},
                       {round_digits}) AS cos_sim
          FROM embeddings c CROSS JOIN q
          WHERE c.vec_id <> q.query_id
        ),
        ann AS (
          SELECT query_id, doc_id, rank FROM (
            SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cos_sim DESC, doc_id ASC) AS INTEGER) AS rank
            FROM dpairs
          ) ranked WHERE rank <= {k}
        ),
        allr AS (SELECT * FROM bm UNION ALL SELECT * FROM ann),
        sc AS (
          SELECT query_id, doc_id,
                 CAST(sum(CAST(round(1000000000.0 / ({rrf_k} + rank), 0)
                               AS BIGINT)) AS BIGINT) AS micro,
                 count(*) AS n_runs
          FROM allr GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id,
               round(micro / 1000000000.0, {round_digits}) AS rrf_score,
               n_runs,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY micro DESC, doc_id ASC) AS INTEGER) AS rank
        FROM sc
        QUALIFY rank <= {topk}
    """


def _phash_bits_ctes(grid: int) -> str:
    """Shared CTE prefix rebuilding the synthetic TNIMG corpus's ahash
    signature table (doc_id, sh): md5(burst)-pattern pixels +
    per-doc flips, integer ahash bit = grid²·px > Σpx. Used by the
    phash dedup mirror and the phash recall mirror."""
    bits = grid * grid
    return f"""
        ks AS (SELECT unnest(generate_series(0, {bits - 1})) AS k),
        hx AS (
          SELECT doc_id,
                 md5(CAST(doc_id // 8 AS VARCHAR))
                   || md5(CAST(doc_id // 8 AS VARCHAR) || 'x') AS h64
          FROM documents
        ),
        px AS (
          SELECT doc_id, k,
            CASE WHEN doc_id % {bits} = k
                   OR (doc_id % 3 >= 1 AND doc_id * 31 % {bits} = k)
                   OR (doc_id % 3 = 2 AND doc_id * 53 % {bits} = k)
              THEN CASE WHEN substr(h64, k + 1, 1) >= '8'
                        THEN 31 ELSE 223 END
              ELSE CASE WHEN substr(h64, k + 1, 1) >= '8'
                        THEN 224 ELSE 32 END
            END AS p
          FROM hx, ks
        ),
        tot AS (SELECT doc_id, sum(p) AS t FROM px GROUP BY doc_id),
        bits_t AS (
          SELECT px.doc_id,
                 string_agg(CASE WHEN {bits} * p > t THEN '1' ELSE '0' END,
                            '' ORDER BY k) AS sh
          FROM px JOIN tot USING (doc_id)
          GROUP BY px.doc_id
        )"""


def multimodal_phash_dedup_sql(
    grid: int = 8, band_bits: int = 16, max_hamming: int = 3
) -> str:
    """Mirror of catalog.multimodal_phash_dedup: rebuild each synthetic
    8x8 image's PIXEL VALUES from the same md5(burst)-pattern +
    per-doc-flips formula the Spark side packs into TNIMG blobs (the
    blob container round-trip is byte-exact, so hashing the rebuilt
    pixels equals hashing the decoded payload), then the identical
    integer ahash (bit = grid²·px > Σpx), banding, candidate join, and
    Hamming verify."""
    bits = grid * grid
    n_bands = bits // band_bits
    return f"""
        WITH {_phash_bits_ctes(grid)},
        buckets AS (
          SELECT doc_id, sh, b AS band_idx,
                 substr(sh, b * {band_bits} + 1, {band_bits}) AS bucket
          FROM bits_t,
               (SELECT unnest(generate_series(0, {n_bands - 1})) AS b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2,
                          a.sh AS sh_1, b.sh AS sh_2
          FROM buckets a
          JOIN buckets b
            ON a.band_idx = b.band_idx AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id
        ),
        verified AS (
          SELECT id_1, id_2,
                 CAST(len(list_filter(generate_series(1, {bits}),
                          i -> substr(sh_1, i, 1) <> substr(sh_2, i, 1)))
                      AS BIGINT) AS hamming
          FROM cand
        )
        SELECT id_1, id_2, hamming FROM verified
        WHERE hamming <= {max_hamming}
    """


def dedup_incremental_phash_sql(
    grid: int = 8, band_bits: int = 16, max_hamming: int = 3
) -> str:
    """Mirror of catalog.dedup_incremental_phash: the shared synthetic
    TNIMG ahash CTEs split into index (even ids) and batch (odd ids)
    sides, candidates from the (band_idx, bucket) join, exact Hamming
    per candidate, best = (hamming asc, index id asc), keep iff no
    candidate within max_hamming."""
    bits = grid * grid
    n_bands = bits // band_bits
    return f"""
        WITH {_phash_bits_ctes(grid)},
        buckets AS (
          SELECT doc_id, sh, b AS band_idx,
                 substr(sh, b * {band_bits} + 1, {band_bits}) AS bucket
          FROM bits_t,
               (SELECT unnest(generate_series(0, {n_bands - 1})) AS b)
        ),
        cand AS (
          SELECT DISTINCT b.doc_id AS bid, i.doc_id AS iid,
                          b.sh AS bsh, i.sh AS ish
          FROM buckets b JOIN buckets i
            ON b.band_idx = i.band_idx AND b.bucket = i.bucket
          WHERE b.doc_id % 2 = 1 AND i.doc_id % 2 = 0
        ),
        scored AS (
          SELECT bid, iid,
                 CAST(len(list_filter(generate_series(1, {bits}),
                          i -> substr(bsh, i, 1) <> substr(ish, i, 1)))
                      AS BIGINT) AS hd
          FROM cand
        ),
        per AS (
          SELECT bid,
                 CAST(count(*) AS BIGINT) AS n_candidates,
                 max(CASE WHEN rn = 1 THEN iid END) AS best_match_id,
                 max(CASE WHEN rn = 1 THEN hd END) AS best_hamming
          FROM (
            SELECT bid, iid, hd,
                   row_number() OVER (
                     PARTITION BY bid ORDER BY hd ASC, iid ASC
                   ) AS rn
            FROM scored
          ) GROUP BY bid
        )
        SELECT d.doc_id,
               coalesce(per.n_candidates, 0) AS n_candidates,
               per.best_match_id,
               per.best_hamming,
               (per.best_hamming IS NULL
                OR per.best_hamming > {max_hamming}) AS keep
        FROM documents d LEFT JOIN per ON d.doc_id = per.bid
        WHERE d.doc_id % 2 = 1
    """


def multimodal_phash_recall_sql(
    grid: int = 8, band_bits: int = 16, max_hamming: int = 3,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.multimodal_phash_recall
    (dedup.bitstring_recall over the phash signature table): exact
    all-pairs Hamming ≤ max_hamming vs the banded pipeline's found
    pairs, one (n_exact_pairs, n_found_pairs, recall) row. Counts via
    count(*) stay BIGINT (the HUGEINT lesson)."""
    bits = grid * grid
    n_bands = bits // band_bits
    return f"""
        WITH {_phash_bits_ctes(grid)},
        exact AS (
          SELECT a.doc_id AS id_1, b.doc_id AS id_2
          FROM bits_t a JOIN bits_t b ON a.doc_id < b.doc_id
          WHERE len(list_filter(generate_series(1, {bits}),
                    i -> substr(a.sh, i, 1) <> substr(b.sh, i, 1)))
                <= {max_hamming}
        ),
        buckets AS (
          SELECT doc_id, sh, b AS band_idx,
                 substr(sh, b * {band_bits} + 1, {band_bits}) AS bucket
          FROM bits_t,
               (SELECT unnest(generate_series(0, {n_bands - 1})) AS b)
        ),
        found AS (
          SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
          FROM buckets a
          JOIN buckets b
            ON a.band_idx = b.band_idx AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id
          WHERE len(list_filter(generate_series(1, {bits}),
                    i -> substr(a.sh, i, 1) <> substr(b.sh, i, 1)))
                <= {max_hamming}
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact)
                 AS n_exact_pairs,
               (SELECT CAST(count(*) AS BIGINT)
                FROM exact e SEMI JOIN found f
                  ON e.id_1 = f.id_1 AND e.id_2 = f.id_2)
                 AS n_found_pairs,
               round((SELECT count(*) FROM exact e SEMI JOIN found f
                        ON e.id_1 = f.id_1 AND e.id_2 = f.id_2) * 1.0
                     / nullif((SELECT count(*) FROM exact), 0),
                     {round_digits}) AS recall
    """


def _audio_bits_ctes(n_frames: int) -> str:
    """Shared CTE prefix rebuilding the synthetic TNAUD corpus's
    energy-envelope signature table (doc_id, sh): md5(burst||'aud')
    loud/quiet frames + per-doc flips, integer bit = n_frames·e > Σe.
    Used by the audio dedup mirror and the incremental-audio mirror."""
    n_samples = n_frames * 2
    return f"""
        ks AS (
          SELECT unnest(generate_series(0, {n_samples - 1})) AS i
        ),
        hx AS (
          SELECT doc_id,
                 md5(CAST(doc_id // 8 AS VARCHAR) || 'aud') AS h32
          FROM documents
        ),
        sv AS (
          SELECT doc_id, i // 2 AS frame,
            CASE WHEN doc_id % {n_samples} = i
                   OR (doc_id % 3 >= 1 AND doc_id * 37 % {n_samples} = i)
                   OR (doc_id % 3 = 2 AND doc_id * 59 % {n_samples} = i)
              THEN CASE WHEN substr(h32, i // 2 + 1, 1) >= 'c'
                        THEN 10 ELSE 100 END
              ELSE CASE WHEN substr(h32, i // 2 + 1, 1) >= 'c'
                        THEN 100 ELSE 10 END
            END AS v
          FROM hx, ks
        ),
        en AS (
          SELECT doc_id, frame, sum(v * v) AS e
          FROM sv GROUP BY doc_id, frame
        ),
        tot AS (SELECT doc_id, sum(e) AS t FROM en GROUP BY doc_id),
        bits_t AS (
          SELECT en.doc_id,
                 string_agg(
                   CASE WHEN {n_frames} * e > t THEN '1' ELSE '0' END,
                   '' ORDER BY frame) AS sh
          FROM en JOIN tot USING (doc_id)
          GROUP BY en.doc_id
        )"""


def multimodal_audio_dedup_sql(
    n_frames: int = 32, band_bits: int = 8, max_hamming: int = 3
) -> str:
    """Mirror of catalog.multimodal_audio_dedup: rebuild each synthetic
    clip's SAMPLE VALUES from the same md5(burst)-envelope + per-doc
    flips formula the Spark side packs into TNAUD blobs, then the
    identical integer energy fingerprint (frame energy = Σ sample²,
    bit = n_frames·e > Σe), banding, candidate join, Hamming verify."""
    n_bands = n_frames // band_bits
    return f"""
        WITH {_audio_bits_ctes(n_frames)},
        buckets AS (
          SELECT doc_id, sh, b AS band_idx,
                 substr(sh, b * {band_bits} + 1, {band_bits}) AS bucket
          FROM bits_t,
               (SELECT unnest(generate_series(0, {n_bands - 1})) AS b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2,
                          a.sh AS sh_1, b.sh AS sh_2
          FROM buckets a
          JOIN buckets b
            ON a.band_idx = b.band_idx AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id
        ),
        verified AS (
          SELECT id_1, id_2,
                 CAST(len(list_filter(generate_series(1, {n_frames}),
                          i -> substr(sh_1, i, 1) <> substr(sh_2, i, 1)))
                      AS BIGINT) AS hamming
          FROM cand
        )
        SELECT id_1, id_2, hamming FROM verified
        WHERE hamming <= {max_hamming}
    """


def dedup_incremental_audio_sql(
    n_frames: int = 32, band_bits: int = 8, max_hamming: int = 3
) -> str:
    """Mirror of catalog.dedup_incremental_audio: the shared synthetic
    TNAUD envelope CTEs split into index (even ids) and batch (odd ids)
    sides — same screen shape as dedup_incremental_phash_sql."""
    n_bands = n_frames // band_bits
    return f"""
        WITH {_audio_bits_ctes(n_frames)},
        buckets AS (
          SELECT doc_id, sh, b AS band_idx,
                 substr(sh, b * {band_bits} + 1, {band_bits}) AS bucket
          FROM bits_t,
               (SELECT unnest(generate_series(0, {n_bands - 1})) AS b)
        ),
        cand AS (
          SELECT DISTINCT b.doc_id AS bid, i.doc_id AS iid,
                          b.sh AS bsh, i.sh AS ish
          FROM buckets b JOIN buckets i
            ON b.band_idx = i.band_idx AND b.bucket = i.bucket
          WHERE b.doc_id % 2 = 1 AND i.doc_id % 2 = 0
        ),
        scored AS (
          SELECT bid, iid,
                 CAST(len(list_filter(generate_series(1, {n_frames}),
                          i -> substr(bsh, i, 1) <> substr(ish, i, 1)))
                      AS BIGINT) AS hd
          FROM cand
        ),
        per AS (
          SELECT bid,
                 CAST(count(*) AS BIGINT) AS n_candidates,
                 max(CASE WHEN rn = 1 THEN iid END) AS best_match_id,
                 max(CASE WHEN rn = 1 THEN hd END) AS best_hamming
          FROM (
            SELECT bid, iid, hd,
                   row_number() OVER (
                     PARTITION BY bid ORDER BY hd ASC, iid ASC
                   ) AS rn
            FROM scored
          ) GROUP BY bid
        )
        SELECT d.doc_id,
               coalesce(per.n_candidates, 0) AS n_candidates,
               per.best_match_id,
               per.best_hamming,
               (per.best_hamming IS NULL
                OR per.best_hamming > {max_hamming}) AS keep
        FROM documents d LEFT JOIN per ON d.doc_id = per.bid
        WHERE d.doc_id % 2 = 1
    """


def _video_sig_ctes(grid: int, n_frames: int) -> str:
    """Shared CTE block of the TNVID oracles (multimodal_video_dedup /
    dedup_incremental_video): rebuild each synthetic video's per-frame
    PIXEL VALUES from the same md5(burst||'v'||f) pattern +
    corrupted-frame flip formula the Spark side packs into TNVID
    blobs, then the per-frame integer ahash — ends with ``sig``
    (doc_id, f, sh)."""
    bits = grid * grid
    return f"""ks AS (SELECT unnest(generate_series(0, {bits - 1})) AS k),
        fs AS (SELECT unnest(generate_series(0, {n_frames - 1})) AS f),
        hx AS (
          SELECT doc_id, f,
                 md5(CAST(doc_id // 8 AS VARCHAR) || 'v'
                     || CAST(f AS VARCHAR))
                   || md5(CAST(doc_id // 8 AS VARCHAR) || 'v'
                          || CAST(f AS VARCHAR) || 'x') AS h64,
                 (f = doc_id % 4
                  OR (doc_id % 2 = 1
                      AND (f = (doc_id + 1) % 4 OR f = (doc_id + 2) % 4))
                 ) AS corrupted
          FROM documents, fs
        ),
        px AS (
          SELECT doc_id, f, k,
            CASE WHEN corrupted AND doc_id % {bits} = k
              THEN CASE WHEN substr(h64, k + 1, 1) >= '8'
                        THEN 31 ELSE 223 END
              ELSE CASE WHEN substr(h64, k + 1, 1) >= '8'
                        THEN 224 ELSE 32 END
            END AS p
          FROM hx, ks
        ),
        tot AS (
          SELECT doc_id, f, sum(p) AS t FROM px GROUP BY doc_id, f
        ),
        sig AS (
          SELECT px.doc_id, px.f,
                 string_agg(CASE WHEN {bits} * p > t THEN '1' ELSE '0' END,
                            '' ORDER BY k) AS sh
          FROM px JOIN tot USING (doc_id, f)
          GROUP BY px.doc_id, px.f
        )"""


def multimodal_video_dedup_sql(
    grid: int = 8, n_frames: int = 4, min_match_frac: float = 0.5,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.multimodal_video_dedup: the shared TNVID
    signature CTEs (:func:`_video_sig_ctes`), then pair videos on
    equal (frame_idx, signature) and keep match_frac >= the
    threshold."""
    return f"""
        WITH {_video_sig_ctes(grid, n_frames)},
        pairs AS (
          SELECT a.doc_id AS id_1, b.doc_id AS id_2,
                 count(*) AS n_matched
          FROM sig a
          JOIN sig b ON a.f = b.f AND a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_1, id_2, n_matched,
               round(n_matched * 1.0 / {n_frames}, {round_digits})
                 AS match_frac
        FROM pairs
        WHERE round(n_matched * 1.0 / {n_frames}, {round_digits})
                >= {min_match_frac}
    """


def dedup_incremental_video_sql(
    grid: int = 8, n_frames: int = 4, min_match_frac: float = 0.5,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.dedup_incremental_video: the shared TNVID
    signature CTEs split into index (even ids) and batch (odd ids)
    sides, candidates from the exact (frame_idx, signature) equi-join,
    match_frac = shared frames / n_frames (all fixture videos hash
    every one of their {n_frames} frames, so max(either side) =
    n_frames), best = (frac desc, index id asc), keep iff no candidate
    reaches the threshold."""
    return f"""
        WITH {_video_sig_ctes(grid, n_frames)},
        cand AS (
          SELECT b.doc_id AS bid, i.doc_id AS iid,
                 count(*) AS n_matched
          FROM sig b JOIN sig i ON b.f = i.f AND b.sh = i.sh
          WHERE b.doc_id % 2 = 1 AND i.doc_id % 2 = 0
          GROUP BY b.doc_id, i.doc_id
        ),
        scored AS (
          SELECT bid, iid,
                 round(n_matched * 1.0 / {n_frames}, {round_digits})
                   AS frac
          FROM cand
        ),
        per AS (
          SELECT bid,
                 CAST(count(*) AS BIGINT) AS n_candidates,
                 max(CASE WHEN rn = 1 THEN iid END) AS best_match_id,
                 max(CASE WHEN rn = 1 THEN frac END) AS best_match_frac
          FROM (
            SELECT bid, iid, frac,
                   row_number() OVER (
                     PARTITION BY bid ORDER BY frac DESC, iid ASC
                   ) AS rn
            FROM scored
          ) GROUP BY bid
        )
        SELECT d.doc_id,
               coalesce(per.n_candidates, 0) AS n_candidates,
               per.best_match_id,
               per.best_match_frac,
               (per.best_match_frac IS NULL
                OR per.best_match_frac < {min_match_frac}) AS keep
        FROM documents d LEFT JOIN per ON d.doc_id = per.bid
        WHERE d.doc_id % 2 = 1
    """


def drift_sql(
    n_buckets: int = 10, eps: float = 1e-6, round_digits: int = 6
) -> str:
    """Mirror of operators/drift.histogram_drift for the catalog's
    orders-totalprice drift query: equal-width buckets over the reference
    min/max, edge-clamped, PSI terms with eps smoothing. All double math
    is the same IEEE ops in the same order as the Spark side."""
    n = n_buckets
    return f"""
        WITH ref AS (
          SELECT o_totalprice::DOUBLE AS x FROM orders
          WHERE o_totalprice IS NOT NULL
        ),
        cur AS (
          SELECT (CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                       ELSE o_totalprice END)::DOUBLE AS x
          FROM orders WHERE o_totalprice IS NOT NULL
        ),
        b AS (
          SELECT min(x) AS mn, (max(x) - min(x)) / {n} AS width FROM ref
        ),
        spine AS (SELECT unnest(generate_series(0, {n - 1})) AS bucket),
        rb AS (
          SELECT least(greatest(CAST(floor((x - mn) / width) AS INT), 0),
                       {n - 1}) AS bucket, count(*) AS n_ref
          FROM ref CROSS JOIN b GROUP BY 1
        ),
        cb AS (
          SELECT least(greatest(CAST(floor((x - mn) / width) AS INT), 0),
                       {n - 1}) AS bucket, count(*) AS n_cur
          FROM cur CROSS JOIN b GROUP BY 1
        ),
        j AS (
          SELECT s.bucket,
                 coalesce(n_ref, 0) AS n_ref,
                 coalesce(n_cur, 0) AS n_cur
          FROM spine s LEFT JOIN rb ON s.bucket = rb.bucket
                       LEFT JOIN cb ON s.bucket = cb.bucket
        ),
        fr AS (
          SELECT bucket, n_ref, n_cur,
                 n_ref / (sum(n_ref) OVER ())::DOUBLE AS frac_ref_raw,
                 n_cur / (sum(n_cur) OVER ())::DOUBLE AS frac_cur_raw
          FROM j
        )
        SELECT f.bucket,
               mn + f.bucket * width AS lo,
               mn + (f.bucket + 1) * width AS hi,
               f.n_ref, f.n_cur,
               round(frac_ref_raw, {round_digits}) AS frac_ref,
               round(frac_cur_raw, {round_digits}) AS frac_cur,
               round(
                 ((CASE WHEN frac_cur_raw = 0 THEN {eps} ELSE frac_cur_raw END)
                  - (CASE WHEN frac_ref_raw = 0 THEN {eps} ELSE frac_ref_raw END))
                 * ln((CASE WHEN frac_cur_raw = 0 THEN {eps} ELSE frac_cur_raw END)
                      / (CASE WHEN frac_ref_raw = 0 THEN {eps} ELSE frac_ref_raw END)),
                 {round_digits}) AS psi_term
        FROM fr f CROSS JOIN b
    """


def profile_sql(table: str, columns: list[str], round_digits: int = 4) -> str:
    """Mirror of operators/profile.profile_columns for numeric columns."""
    selects = []
    for c in columns:
        selects.append(f"""
          SELECT '{c}' AS "column",
                 count(*) AS n,
                 count(*) FILTER (WHERE {c} IS NULL) AS n_null,
                 count(DISTINCT {c}) AS n_distinct,
                 min({c}::DOUBLE) AS min_value,
                 max({c}::DOUBLE) AS max_value,
                 round(avg({c}::DOUBLE), {round_digits}) AS avg_value,
                 round(stddev({c}::DOUBLE), {round_digits}) AS stddev_value,
                 quantile_cont({c}::DOUBLE, 0.25) AS p25,
                 quantile_cont({c}::DOUBLE, 0.5) AS p50,
                 quantile_cont({c}::DOUBLE, 0.75) AS p75,
                 quantile_cont({c}::DOUBLE, 0.95) AS p95
          FROM {table}""")
    return "\n          UNION ALL\n".join(selects)


def profile_accuracy_sql(table: str, columns: list[str]) -> str:
    """Oracle twin of operators/profile.profile_accuracy: the exact
    counts plus literal TRUE verdicts. The Spark side measures the HLL /
    percentile-sketch estimates against Spark-computed exact aggregates;
    this oracle hash goes red exactly when a sketch breaks its published
    bound (or the exact counts drift)."""
    selects = []
    for c in columns:
        selects.append(f"""
          SELECT '{c}' AS "column",
                 count(*) AS n,
                 count(*) FILTER (WHERE {c} IS NULL) AS n_null,
                 TRUE AS distinct_ok,
                 TRUE AS pct_ok
          FROM {table}""")
    return "\n          UNION ALL\n".join(selects)


def streaming_dedup_sql() -> str:
    """Streaming first-arrival dedup on key columns == the distinct key
    set once the stream drains."""
    return "SELECT DISTINCT user_id, event_type FROM events"


def streaming_incremental_dedup_sql(
    cuts: tuple[str, ...] = ("2024-01-11", "2024-01-21"),
) -> str:
    """Mirror of catalog.streaming_incremental_dedup: the deterministic
    replay's micro-batches ARE the time cuts, so the per-batch
    accept/reject ledger is replayable in SQL — per content key
    (concat_ws of user_id/event_type, identical skip-null semantics on
    both engines), a batch KNOWS a key iff an earlier cut contained it
    and ACCEPTS exactly the keys whose first cut it is; the index size
    after each upsert is the running sum of accepts."""
    cases = " ".join(
        f"WHEN ts < TIMESTAMP '{c} 00:00:00' THEN {i}"
        for i, c in enumerate(cuts)
    )
    n_batches = len(cuts) + 1
    return f"""
        WITH keyed AS (
          SELECT event_id,
                 md5(concat_ws('|', user_id, event_type)) AS dup_key,
                 CASE {cases} ELSE {len(cuts)} END AS cut
          FROM events
        ),
        first_cut AS (
          SELECT dup_key, min(cut) AS c0 FROM keyed GROUP BY dup_key
        ),
        per AS (
          SELECT k.cut AS batch_id,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT CASE WHEN f.c0 < k.cut
                                          THEN k.dup_key END)
                      AS BIGINT) AS n_known_keys,
                 CAST(count(DISTINCT CASE WHEN f.c0 = k.cut
                                          THEN k.dup_key END)
                      AS BIGINT) AS n_new_keys
          FROM keyed k JOIN first_cut f USING (dup_key)
          GROUP BY k.cut
        ),
        ids AS (
          SELECT unnest(generate_series(0, {n_batches - 1})) AS batch_id
        )
        SELECT CAST(i.batch_id AS BIGINT) AS batch_id,
               coalesce(p.n_rows, 0) AS n_rows,
               coalesce(p.n_known_keys, 0) AS n_known_keys,
               coalesce(p.n_new_keys, 0) AS n_new_keys,
               CAST(sum(coalesce(p.n_new_keys, 0))
                    OVER (ORDER BY i.batch_id) AS BIGINT)
                 AS cum_index_keys
        FROM ids i LEFT JOIN per p ON i.batch_id = p.batch_id
    """


def streaming_window_metrics_sql(window: str = "1 hour") -> str:
    """Batch equivalent of the streaming tumbling-window aggregation.
    complete output mode emits every window, so the oracle is a plain
    GROUP BY time_bucket. ts is TIMESTAMP_NS in parquet; CAST truncates
    to micros exactly like the Spark-side load conversion."""
    bucket = f"time_bucket(INTERVAL {window}, CAST(ts AS TIMESTAMP))"
    return f"""
        SELECT {bucket} AS window_start,
               {bucket} + INTERVAL {window} AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               round(round(sum(value), 6) / count(*), 6) AS avg_value
        FROM events
        GROUP BY 1, 2, 3
    """


def streaming_topk_types_sql(window: str = "1 hour", k: int = 3) -> str:
    """Batch twin of streaming_topk_types: the windowed-count oracle
    plus the same (count desc, type asc) rank, top k per window."""
    bucket = f"time_bucket(INTERVAL {window}, CAST(ts AS TIMESTAMP))"
    return f"""
        WITH agg AS (
          SELECT {bucket} AS window_start,
                 {bucket} + INTERVAL {window} AS window_end,
                 event_type,
                 count(*) AS n_events,
                 round(sum(value), 6) AS sum_value,
                 round(round(sum(value), 6) / count(*), 6) AS avg_value
          FROM events
          GROUP BY 1, 2, 3
        )
        SELECT window_start, window_end, event_type, n_events,
               sum_value, avg_value, rank
        FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type ASC) AS INTEGER
                 ) AS rank
          FROM agg
        ) ranked WHERE rank <= {k}
    """


def streaming_sessionize_sql(gap_minutes: int = 30) -> str:
    """Sessions the streaming operator CLOSES: batch gap-sessionization
    minus sessions still open at the final watermark (the availableNow
    run's last watermark is max(ts), so a session is closed iff
    session_end + gap < max(ts) — verified empirically, see
    streaming/stateful.py)."""
    return f"""
        WITH base AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ),
        marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts > lag(ts) OVER w + INTERVAL {gap_minutes} MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM base
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sid
          FROM marked
        ),
        agg AS (
          SELECT user_id, sid,
                 min(ts) AS session_start,
                 max(ts) AS session_end,
                 count(*) AS n_events
          FROM sess GROUP BY 1, 2
        )
        SELECT user_id, session_start, session_end, n_events
        FROM agg
        WHERE session_end + INTERVAL {gap_minutes} MINUTE
              < (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
    """


def streaming_drift_sql(
    n_buckets: int = 10, eps: float = 1e-6, round_digits: int = 6
) -> str:
    """Batch twin of the streaming drift monitor: the stream's
    accumulated counts equal a plain batch histogram over all events,
    referenced against the click-only distribution. Same formulas as
    drift_sql."""
    n = n_buckets
    return f"""
        WITH ref AS (
          SELECT value::DOUBLE AS x FROM events
          WHERE event_type = 'click' AND value IS NOT NULL
        ),
        cur AS (
          SELECT value::DOUBLE AS x FROM events WHERE value IS NOT NULL
        ),
        b AS (
          SELECT min(x) AS mn, (max(x) - min(x)) / {n} AS width FROM ref
        ),
        spine AS (SELECT unnest(generate_series(0, {n - 1})) AS bucket),
        rb AS (
          SELECT least(greatest(CAST(floor((x - mn) / width) AS INT), 0),
                       {n - 1}) AS bucket, count(*) AS n_ref
          FROM ref CROSS JOIN b GROUP BY 1
        ),
        cb AS (
          SELECT least(greatest(CAST(floor((x - mn) / width) AS INT), 0),
                       {n - 1}) AS bucket, count(*) AS n_cur
          FROM cur CROSS JOIN b GROUP BY 1
        ),
        j AS (
          SELECT s.bucket,
                 coalesce(n_ref, 0) AS n_ref,
                 coalesce(n_cur, 0) AS n_cur
          FROM spine s LEFT JOIN rb ON s.bucket = rb.bucket
                       LEFT JOIN cb ON s.bucket = cb.bucket
        ),
        fr AS (
          SELECT bucket, n_ref, n_cur,
                 n_ref / (sum(n_ref) OVER ())::DOUBLE AS frac_ref_raw,
                 n_cur / (sum(n_cur) OVER ())::DOUBLE AS frac_cur_raw
          FROM j
        )
        SELECT f.bucket,
               mn + f.bucket * width AS lo,
               mn + (f.bucket + 1) * width AS hi,
               f.n_ref, f.n_cur,
               round(frac_ref_raw, {round_digits}) AS frac_ref,
               round(frac_cur_raw, {round_digits}) AS frac_cur,
               round(
                 ((CASE WHEN frac_cur_raw = 0 THEN {eps} ELSE frac_cur_raw END)
                  - (CASE WHEN frac_ref_raw = 0 THEN {eps} ELSE frac_ref_raw END))
                 * ln((CASE WHEN frac_cur_raw = 0 THEN {eps} ELSE frac_cur_raw END)
                      / (CASE WHEN frac_ref_raw = 0 THEN {eps} ELSE frac_ref_raw END)),
                 {round_digits}) AS psi_term
        FROM fr f CROSS JOIN b
    """


def streaming_session_window_sql(gap_minutes: int = 30) -> str:
    """Batch twin of the built-in session_window aggregation: gap
    islands with session_end = last_ts + gap (Spark's window end), new
    session on diff > gap (touching windows MERGE — verified against a
    boundary fixture in test_streaming.py), closed-session filter at the
    final watermark (= max ts with 0s delay)."""
    return f"""
        WITH base AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        ),
        marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts > lag(ts) OVER w + INTERVAL {gap_minutes} MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM base
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
          SELECT user_id, ts, value,
                 sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sid
          FROM marked
        ),
        agg AS (
          SELECT user_id,
                 min(ts) AS session_start,
                 max(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
                 count(*) AS n_events,
                 round(sum(value), 6) AS sum_value
          FROM sess GROUP BY user_id, sid
        )
        SELECT user_id, session_start, session_end, n_events, sum_value
        FROM agg
        -- <= not <: Spark append mode emits a session whose end EQUALS
        -- the final watermark (watermark >= end closes the window)
        WHERE session_end <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
    """


def streaming_assertion_metrics_sql(rules: list[tuple[str, str, float]]) -> str:
    """Stream-level merged assertion metrics == batch metrics over the
    whole table (verified by tests/test_streaming.py). Invalid count uses
    NOT(query) — NULL predicates count as valid, matching the batch
    evaluator's filter semantics."""
    selects = []
    for query, description, threshold in rules:
        desc = description.replace("'", "''")
        selects.append(f"""
          SELECT '{desc}' AS description,
                 count(*) FILTER (WHERE NOT({query})) AS num_invalid,
                 count(*) FILTER (WHERE NOT({query})) * 1.0 / count(*)
                     AS fraction_invalid,
                 (count(*) FILTER (WHERE NOT({query})) * 1.0 / count(*))
                     > {threshold} AS failed
          FROM events""")
    return "\n          UNION ALL\n".join(selects)


def text_fingerprints_sql() -> str:
    return f"""
        {_DOC_BASE},
        distinct_toks AS (
          SELECT doc_id, text, __t__, list_distinct(__t__) AS __dt__ FROM toked
        )
        SELECT doc_id,
               md5(text) AS exact_md5,
               {sorted_token_fingerprint()} AS token_fingerprint,
               {simhash_expr(32)} AS simhash32
        FROM distinct_toks
    """


# ---------------------------------------------------------------------------
# Round-4 additions: temporal dedup, transitions, winsorize, hash split,
# quality bands, embedding norms, token histogram
# ---------------------------------------------------------------------------

def events_throttle_dedup_sql(min_gap_seconds: int = 300) -> str:
    """Mirror of temporal.throttle_dedup on (user_id, event_type)."""
    gap_us = min_gap_seconds * 1_000_000
    return f"""
        WITH lagged AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ) AS prev_us
          FROM events
        )
        SELECT event_id, user_id, event_type, ts,
               round((epoch_us(ts) - prev_us) / 1000000.0, 6) AS gap_seconds,
               (prev_us IS NULL OR epoch_us(ts) - prev_us > {gap_us}) AS kept
        FROM lagged
    """


def cusum_changepoints_sql(
    drift_k: float = 0.5,
    threshold_h: float = 3.0,
    decimals: int = 2,
    round_digits: int = 6,
) -> str:
    """Mirror of temporal.cusum_changepoints over events: identical
    integer numerator-form deviations, the cumsum-minus-running-min
    unrolling in HUGEINT, same alarm predicate and final division."""
    scale = 10 ** decimals
    k_s = round(float(drift_k) * scale)
    h_s = round(float(threshold_h) * scale)
    win = (
        "PARTITION BY k ORDER BY ts, tb "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return f"""
        WITH base AS (
          SELECT user_id AS k, ts, event_id AS tb,
                 CAST(round(CAST(value AS DOUBLE) * {float(scale)!r})
                      AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ),
        st AS (
          SELECT k, count(*) AS n, sum(v) AS sv FROM base GROUP BY k
        ),
        j AS (
          SELECT b.k, b.ts, b.tb, st.n, st.sv,
                 CAST(st.n AS HUGEINT) * b.v - st.sv
                   - CAST(st.n AS HUGEINT) * {k_s} AS y_up,
                 CAST(st.sv AS HUGEINT) - CAST(st.n AS HUGEINT) * b.v
                   - CAST(st.n AS HUGEINT) * {k_s} AS y_dn
          FROM base b JOIN st USING (k)
        ),
        cums AS (
          SELECT k, ts, tb, n,
                 sum(y_up) OVER ({win}) AS cu,
                 sum(y_dn) OVER ({win}) AS cd
          FROM j
        ),
        scored AS (
          SELECT k, ts, n,
                 cu - least(min(cu) OVER ({win}), 0) AS s_up,
                 cd - least(min(cd) OVER ({win}), 0) AS s_dn
          FROM cums
        )
        SELECT k AS user_id,
               count(*) AS n_points,
               CAST(sum(CASE WHEN s_up > CAST(n AS HUGEINT) * {h_s}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_up_alarms,
               CAST(sum(CASE WHEN s_dn > CAST(n AS HUGEINT) * {h_s}
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_down_alarms,
               round(CAST(greatest(max(s_up), max(s_dn)) AS DOUBLE)
                     / (CAST(max(n) AS DOUBLE) * {float(scale)!r}),
                     {round_digits}) AS max_stat,
               min(CASE WHEN s_up > CAST(n AS HUGEINT) * {h_s}
                         OR s_dn > CAST(n AS HUGEINT) * {h_s}
                        THEN ts END) AS first_alarm_ts
        FROM scored GROUP BY k
    """


def sequence_likelihood_sql(
    k: float = 1.0,
    round_digits: int = 4,
) -> str:
    """Mirror of temporal.sequence_likelihood over events: one lag
    window, add-k transition model, per-user mean −ln P."""
    kk = repr(float(k))
    return f"""
        WITH pairs AS (
          SELECT user_id AS key,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev,
                 event_type AS next
          FROM events
        ),
        trans AS (
          SELECT prev, next, count(*) AS c2
          FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2
        ),
        prior AS (
          SELECT prev, count(*) AS c1
          FROM pairs WHERE prev IS NOT NULL GROUP BY 1
        ),
        ns AS (SELECT count(DISTINCT next) AS v FROM pairs),
        lp AS (
          SELECT t.prev, t.next,
                 ln((t.c2 + {kk}) / (p.c1 + {kk} * ns.v)) AS lp
          FROM trans t JOIN prior p USING (prev), ns
        ),
        scored AS (
          SELECT pairs.key,
                 count(*) AS n_transitions,
                 round(avg(-lp.lp), {round_digits}) AS avg_neg_logprob
          FROM pairs
          JOIN lp ON lp.prev = pairs.prev AND lp.next = pairs.next
          GROUP BY pairs.key
        )
        SELECT d.key AS user_id,
               CAST(coalesce(s.n_transitions, 0) AS BIGINT)
                 AS n_transitions,
               s.avg_neg_logprob
        FROM (SELECT DISTINCT key FROM pairs) d
        LEFT JOIN scored s USING (key)
    """


def event_transitions_sql() -> str:
    """Mirror of temporal.transition_counts per user over (ts, event_id)."""
    return """
        WITH seq AS (
          SELECT lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ) AS prev_state,
                 event_type AS next_state
          FROM events
        )
        SELECT prev_state, next_state, count(*) AS n_transitions
        FROM seq WHERE prev_state IS NOT NULL
        GROUP BY prev_state, next_state
    """


def benford_sql(
    table: str,
    value_col: str,
    int_scale: int = 100,
    round_digits: int = 6,
) -> str:
    """Mirror of drift.benford_first_digit: power-of-10 scale →
    BIGINT → first decimal-string character, nine-row digit frame via
    range, expected shares log10(1 + 1/d)."""
    return f"""
        WITH counts AS (
          SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
                 count(*) AS n
          FROM (
            SELECT CAST(round({value_col} * {int_scale}) AS BIGINT) AS v
            FROM {table}
          ) WHERE v >= 1
          GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM counts),
        digits AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit)
        SELECT d.digit,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
               round(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.N,
                     {round_digits}) AS observed_p,
               round(log10(1.0 + 1.0 / d.digit), {round_digits})
                 AS expected_p,
               round(abs(round(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.N,
                               {round_digits})
                         - round(log10(1.0 + 1.0 / d.digit),
                                 {round_digits})),
                     {round_digits}) AS abs_dev
        FROM digits d LEFT JOIN counts c ON c.digit = d.digit, tot t
        ORDER BY d.digit
    """


def streaming_benford_sql(
    window: str = "1 day", int_scale: int = 100
) -> str:
    """Batch equivalent of streaming.ops.windowed_benford: time_bucket
    windows + the integer-exact first-digit extraction."""
    bucket = f"time_bucket(INTERVAL {window}, CAST(ts AS TIMESTAMP))"
    return f"""
        SELECT {bucket} AS window_start,
               {bucket} + INTERVAL {window} AS window_end,
               CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               count(*) AS n_values
        FROM (
          SELECT ts, CAST(round(value * {int_scale}) AS BIGINT) AS v
          FROM events
        ) WHERE v >= 1
        GROUP BY 1, 2, 3
    """


def frequent_paths_sql(n_steps: int = 3, k: int = 20) -> str:
    """Mirror of temporal.frequent_paths over events: n-1 lead()
    columns in one window pass, all-steps-non-null filter, path-space
    groupBy with count + distinct-user count, top-k with the
    (count desc, path asc) total order."""
    leads = ",\n                 ".join(
        f"lead(event_type, {i}) OVER w AS s{i}" for i in range(1, n_steps)
    )
    concat = " || ' > ' || ".join(f"s{i}" for i in range(n_steps))
    notnull = " AND ".join(f"s{i} IS NOT NULL" for i in range(n_steps))
    return f"""
        WITH seq AS (
          SELECT user_id,
                 event_type AS s0,
                 {leads}
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ),
        paths AS (
          SELECT user_id, {concat} AS path
          FROM seq WHERE {notnull}
        ),
        agg AS (
          SELECT path,
                 count(*) AS n_occurrences,
                 count(DISTINCT user_id) AS n_keys
          FROM paths GROUP BY path
        )
        SELECT path, n_occurrences, n_keys,
               CAST(row_number() OVER (
                 ORDER BY n_occurrences DESC, path ASC) AS INTEGER) AS rank
        FROM agg
        ORDER BY n_occurrences DESC, path ASC
        LIMIT {k}
    """


def winsorize_sql(
    table: str,
    value_col: str,
    keep_cols: list[str],
    group_cols: list[str],
    lower_p: float = 0.05,
    upper_p: float = 0.95,
    round_digits: int = 4,
) -> str:
    """Mirror of curation.winsorize (exact path): quantile_cont is the
    same linear-interpolation definition as Spark's percentile()."""
    keep = ", ".join(keep_cols)
    grp = ", ".join(group_cols)
    using = ", ".join(group_cols)
    return f"""
        WITH bounds AS (
          SELECT {grp},
                 round(quantile_cont({value_col}, {lower_p}), {round_digits})
                     AS lo,
                 round(quantile_cont({value_col}, {upper_p}), {round_digits})
                     AS hi
          FROM {table} GROUP BY {grp}
        )
        SELECT {keep}, lo, hi,
               round(least(greatest({value_col}, lo), hi), {round_digits})
                   AS {value_col}_clipped
        FROM {table} JOIN bounds USING ({using})
    """


def hash_split_sql(
    fractions: dict[str, float],
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("doc_id", "source"),
    table: str = "documents",
    salt: str = "split",
) -> str:
    """Mirror of curation.hash_split: identical cumulative-threshold
    accumulation (same float math) and md5 prefix compare."""
    from topnotch_spark.operators.curation import _rate_threshold_hex

    names = list(fractions)
    cum = 0.0
    cases = []
    key = f"substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8)"
    for name, frac in list(fractions.items())[:-1]:
        cum += frac
        thr = _rate_threshold_hex(min(cum, 1.0))
        cases.append(f"WHEN {key} < '{thr}' THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    keep = ", ".join(keep_cols)
    return f"SELECT {keep}, {case} AS split FROM {table}"


def quality_bands_sql(
    n_bands: int = 4,
    order_col: str = "n_chars",
    partition_col: str = "source",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """Mirror of textqc.quality_bands: ntile over the same total order."""
    return f"""
        SELECT {id_col}, {partition_col}, {order_col},
               CAST(ntile({n_bands}) OVER (
                 PARTITION BY {partition_col}
                 ORDER BY {order_col}, {id_col}
               ) AS INTEGER) AS band
        FROM {table}
    """


def embedding_norm_outliers_sql(k: float = 2.0, round_digits: int = 6) -> str:
    """Mirror of similarity.embedding_norm_outliers: the norm is the
    same left-fold double accumulation (list_sum over the squared
    elements in array order), rounded before the stats so both engines
    window over identical doubles."""
    return f"""
        WITH norms AS (
          SELECT vec_id, label,
                 round(sqrt(coalesce(list_sum(list_transform(
                   embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                 )), 0.0)), {round_digits}) AS l2_norm
          FROM embeddings
        ),
        stats AS (
          SELECT vec_id, label, l2_norm,
                 avg(l2_norm) OVER (PARTITION BY label) AS m,
                 stddev_samp(l2_norm) OVER (PARTITION BY label) AS s
          FROM norms
        )
        SELECT vec_id, label, l2_norm,
               CASE WHEN s > 0 THEN round((l2_norm - m) / s, {round_digits})
                    ELSE 0.0 END AS zscore,
               abs(CASE WHEN s > 0
                        THEN round((l2_norm - m) / s, {round_digits})
                        ELSE 0.0 END) > {k} AS is_outlier
        FROM stats
    """


def token_histogram_sql() -> str:
    """Mirror of textqc.token_length_histogram: integer log2 via
    length(bin(n)) - 1; sums cast to BIGINT (DuckDB sum() yields
    HUGEINT — the round-2 dtype lesson)."""
    return f"""
        {_DOC_BASE},
        counted AS (
          SELECT CAST(len(__t__) AS BIGINT) AS n_tokens FROM toked
        )
        SELECT CAST(CASE WHEN n_tokens <= 0 THEN -1
                         ELSE length(bin(n_tokens)) - 1 END AS INTEGER)
                   AS log2_bucket,
               count(*) AS n_docs,
               min(n_tokens) AS min_tokens,
               max(n_tokens) AS max_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        FROM counted
        GROUP BY 1
    """


def event_funnel_sql(stages: list[str]) -> str:
    """Mirror of temporal.funnel_stages: each stage's per-user first
    time strictly after the previous stage's."""
    ctes = [
        f"""s0 AS (
          SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events
          WHERE event_type = '{stages[0]}' GROUP BY user_id
        )"""
    ]
    for i, stage in enumerate(stages[1:], start=1):
        ctes.append(
            f"""s{i} AS (
          SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t
          FROM events e JOIN s{i - 1} p
            ON e.user_id = p.user_id AND CAST(e.ts AS TIMESTAMP) > p.t
          WHERE e.event_type = '{stage}' GROUP BY e.user_id
        )"""
        )
    selects = [
        f"SELECT {i} AS stage_idx, '{s}' AS stage, count(*) AS n_users FROM s{i}"
        for i, s in enumerate(stages)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def text_unigram_logprob_sql(round_digits: int = 4) -> str:
    """Mirror of textqc.unigram_logprob: ln(c/total) per token, per-doc
    mean of the negative, empty docs kept with NULL score."""
    return f"""
        {_DOC_BASE},
        tok AS (SELECT doc_id, unnest(__t__) AS token FROM toked),
        vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
        lp AS (
          SELECT token, ln(c / CAST(total AS DOUBLE)) AS lp FROM vocab, tot
        ),
        per AS (
          SELECT doc_id, count(*) AS n_tokens,
                 round(avg(-lp), {round_digits}) AS avg_neg_logprob
          FROM tok JOIN lp USING (token) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
               per.avg_neg_logprob
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


def source_mix_sql(alpha: float = 0.5, round_digits: int = 6) -> str:
    """Mirror of curation.source_mix_weights (token-share temperature
    weights); sums cast to BIGINT per the HUGEINT dtype rule."""
    return f"""
        WITH per AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(len({tokens()})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ),
        tot AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
                 sum(pow(CAST(n_tokens AS DOUBLE), {alpha})) AS z
          FROM per
        )
        SELECT source, n_docs, n_tokens,
               round(n_tokens / CAST(total AS DOUBLE), {round_digits})
                   AS token_share,
               round(pow(CAST(n_tokens AS DOUBLE), {alpha}) / z,
                     {round_digits}) AS mix_weight
        FROM per, tot
    """


def sample_token_budget_sql(
    budget_tokens: int, alpha: float = 0.5, round_digits: int = 6
) -> str:
    """Mirror of curation.sample_to_token_budget: same temperature
    weights, same md5-ordered per-source prefix fill."""
    return f"""
        WITH per AS (
          SELECT source,
                 CAST(sum(len({tokens()})) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ),
        tot AS (
          SELECT sum(pow(CAST(n_tokens AS DOUBLE), {alpha})) AS z FROM per
        ),
        wts AS (
          SELECT source,
                 round(pow(CAST(n_tokens AS DOUBLE), {alpha}) / z,
                       {round_digits}) AS mix_weight
          FROM per, tot
        ),
        base AS (
          SELECT doc_id, source,
                 CAST(coalesce(len({tokens()}), 0) AS BIGINT) AS n_tokens
          FROM documents
        ),
        cum AS (
          SELECT doc_id, source, n_tokens,
                 CAST(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS UNBOUNDED PRECEDING
                 ) AS BIGINT) AS cum_tokens
          FROM base
        )
        SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens,
               round({float(budget_tokens)} * w.mix_weight, {round_digits})
                 AS target_tokens,
               (c.cum_tokens - c.n_tokens) <
                 round({float(budget_tokens)} * w.mix_weight, {round_digits})
                 AS selected
        FROM cum c JOIN wts w USING (source)
    """


def dedup_rate_by_source_sql(round_digits: int = 6) -> str:
    """Mirror of dedup.dedup_rate_by_group over documents/source."""
    return f"""
        WITH flags AS (
          SELECT doc_id, source,
                 doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
          FROM documents
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keepers,
               round(1.0 - sum(CASE WHEN keep THEN 1 ELSE 0 END)
                           / CAST(count(*) AS DOUBLE), {round_digits})
                   AS dup_rate
        FROM flags GROUP BY source
    """


def project_embeddings_sql(
    out_dim: int = 8, dim: int = 64, round_digits: int = 6
) -> str:
    """Mirror of similarity.project_embeddings: identical literal ±1
    planes (md5 'p<plane>_d<dim>' convention), same left-fold double
    accumulation via list_sum over the per-element products."""
    from topnotch_spark.functions.vectors import plane_signs

    selects = []
    for p in range(out_dim):
        signs = ", ".join(str(s) for s in plane_signs(p, dim))
        proj = (
            f"coalesce(list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> embedding[i]::DOUBLE * (list_value({signs}))[i])), 0.0)"
        )
        selects.append(
            f"SELECT vec_id, {p} AS pos, round({proj}, {round_digits}) "
            "AS value FROM embeddings"
        )
    return "\nUNION ALL\n".join(selects)


def lang_mix_sql(lang_markers: dict[str, list[str]], round_digits: int = 6) -> str:
    """Mirror of textqc.lang_mix: the langid CASE chain rolled up per
    source with a window-normalized share."""
    scores = {lang: _stopword_ratio(m) for lang, m in lang_markers.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    # t.text: both toked and documents carry a text column in the join
    pred = "CASE WHEN regexp_matches(t.text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'"
    for lang in lang_markers:
        pred += f" WHEN {scores[lang]} = {best} THEN '{lang}'"
    pred += " END"
    return f"""
        {_DOC_BASE},
        lid AS (
          SELECT t.doc_id, d.source, {pred} AS predicted_lang
          FROM toked t JOIN documents d ON t.doc_id = d.doc_id
        )
        SELECT source, predicted_lang, count(*) AS n_docs,
               round(count(*) / CAST(sum(count(*))
                     OVER (PARTITION BY source) AS DOUBLE), {round_digits})
                   AS share
        FROM lid GROUP BY source, predicted_lang
    """


def dedup_lines_sql(max_line_df: int = 1, min_chars: int = 1) -> str:
    """Mirror of curation.dedup_lines over the footer-constructed corpus
    (catalog.dedup_lines_footer): same split, same document-frequency
    cap with the short-line exemption, same in-order reassembly
    (string_agg ORDER BY position = Spark's array_sort on (pos, line)).
    n_lines/n_removed CAST to BIGINT for dtype-kind parity."""
    return f"""
        WITH docs AS (
          SELECT doc_id, text || chr(10) || 'mirrored via ' || source AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, u.pos, u.line
          FROM docs, LATERAL (
            SELECT generate_subscripts(string_split(docs.text, chr(10)), 1)
                       AS pos,
                   unnest(string_split(docs.text, chr(10))) AS line
          ) u
        ),
        hot AS (
          SELECT line
          FROM (SELECT DISTINCT doc_id, line FROM lines
                WHERE length(line) >= {min_chars})
          GROUP BY line HAVING count(*) > {max_line_df}
        ),
        kept AS (
          SELECT l.doc_id, l.pos, l.line
          FROM lines l LEFT JOIN hot h ON l.line = h.line
          WHERE h.line IS NULL
        ),
        reb AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text2,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(r.text2, '') AS text,
               CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
               CAST(len(string_split(d.text, chr(10))) - coalesce(r.n_kept, 0)
                    AS BIGINT) AS n_removed
        FROM docs d LEFT JOIN reb r ON d.doc_id = r.doc_id
    """


def weighted_sample_sql(salt: str = "wsample") -> str:
    """Mirror of curation.weighted_sample with the n_chars/400 length
    weight (catalog.weighted_sample_bylength): identical md5 hex on both
    engines, identical 32-bit fraction and clamp arithmetic in IEEE
    double, so the kept row set matches exactly."""
    frac = (
        f"(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT / 4294967296.0)"
    )
    return f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {frac} < least(greatest(n_chars / 400.0, 0.0), 1.0)
    """


def similarity_recall_sql(
    dim: int = 64, k: int = 10, n_queries: int = 5, n_planes: int = 8,
    n_centroids: int = 16, n_probe: int = 4, round_digits: int = 6,
) -> str:
    """Mirror of catalog.similarity_ann_recall (topk_recall of BOTH
    approximate indexes vs brute force): every neighbor list re-derived
    with the existing oracle builders (each is a full WITH-query, legal
    as a parenthesized subquery in DuckDB), then |approx ∩ exact| /
    |exact| per (method, query). Counts CAST to BIGINT for dtype-kind
    parity; missing-from-approx queries coalesce to 0 hits."""
    exact = similarity_topk_sql(dim, k, n_queries, round_digits)
    methods = {
        "srp": similarity_ann_sql(dim, k, n_queries, n_planes, round_digits),
        "ivf": similarity_ivf_sql(
            dim, k, n_queries, n_centroids, n_probe, round_digits
        ),
    }
    parts = []
    for name, approx in methods.items():
        parts.append(f"""
        SELECT '{name}' AS method, t.query_id,
               CAST(t.n_exact AS BIGINT) AS n_exact,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(coalesce(h.n_hits, 0) / t.n_exact, {round_digits})
                   AS recall
        FROM (
          SELECT query_id, count(*) AS n_exact
          FROM ({exact}) GROUP BY query_id
        ) t
        LEFT JOIN (
          SELECT e.query_id, count(*) AS n_hits
          FROM ({exact}) e
          JOIN ({approx}) a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
          GROUP BY e.query_id
        ) h ON t.query_id = h.query_id
        """)
    return "\nUNION ALL\n".join(parts)


def duplicate_spans_sql(span_tokens: int = 20, min_occurrences: int = 2) -> str:
    """Mirror of dedup.duplicate_spans: same token model, same
    ``span_tokens``-token windows joined with single spaces (identical
    to the Spark regex extraction over whitespace-normalized text), same
    md5 keying. ``pos`` is 0-based on both engines (generate_subscripts
    is 1-based, hence the -1); counts CAST to BIGINT for dtype parity."""
    return f"""
        {_DOC_BASE},
        sp AS (
          SELECT doc_id,
                 list_transform(
                   generate_series(1, greatest(len(__t__) - {span_tokens} + 1, 0)),
                   i -> array_to_string(__t__[i:i+{span_tokens}-1], ' ')
                 ) AS spans
          FROM toked
        ),
        occur AS (
          SELECT doc_id, u.pos - 1 AS pos, md5(u.s) AS span_key
          FROM sp, LATERAL (
            SELECT generate_subscripts(spans, 1) AS pos, unnest(spans) AS s
          ) u
        ),
        counts AS (
          SELECT span_key,
                 count(*) AS n_occurrences,
                 count(DISTINCT doc_id) AS n_docs
          FROM occur GROUP BY span_key
        )
        SELECT o.doc_id AS id, o.pos, o.span_key,
               CAST(c.n_occurrences AS BIGINT) AS n_occurrences,
               CAST(c.n_docs AS BIGINT) AS n_docs
        FROM occur o JOIN counts c ON o.span_key = c.span_key
        WHERE c.n_occurrences >= {min_occurrences}
    """


def dedup_index_compaction_sql() -> str:
    """Mirror of catalog.dedup_index_compaction: the 3-round
    incremental fold collapses to one closed form — per content key the
    owner is the lowest doc_id of the EARLIEST round (doc_id % 3)
    holding the key, because each round only admits keys absent from
    every earlier round and picks its own min-id holder."""
    return """
        WITH keyed AS (
          SELECT doc_id, md5(coalesce(text, '')) AS dup_key,
                 doc_id % 3 AS round
          FROM documents
        )
        SELECT dup_key, doc_id AS index_id FROM (
          SELECT dup_key, doc_id,
                 row_number() OVER (
                   PARTITION BY dup_key ORDER BY round ASC, doc_id ASC
                 ) AS rn
          FROM keyed
        ) WHERE rn = 1
    """


def rewrite_duplicate_spans_sql(
    span_tokens: int = 20, min_occurrences: int = 2
) -> str:
    """Mirror of dedup.rewrite_duplicate_spans: the duplicate_spans_sql
    occurrence CTEs, a keep-first rank per span_key over (doc, pos),
    cut ranges exploded to token positions, anti-joined against the
    position-indexed token stream, and the survivors re-joined in
    order. Same 0-based positions, same normalized token space."""
    return f"""
        {_DOC_BASE},
        sp AS (
          SELECT doc_id,
                 list_transform(
                   generate_series(1, greatest(len(__t__) - {span_tokens} + 1, 0)),
                   i -> array_to_string(__t__[i:i+{span_tokens}-1], ' ')
                 ) AS spans
          FROM toked
        ),
        occur AS (
          SELECT doc_id, u.pos - 1 AS pos, md5(u.s) AS span_key
          FROM sp, LATERAL (
            SELECT generate_subscripts(spans, 1) AS pos, unnest(spans) AS s
          ) u
        ),
        dup_occ AS (
          SELECT doc_id, pos, span_key,
                 row_number() OVER (
                   PARTITION BY span_key ORDER BY doc_id ASC, pos ASC
                 ) AS rn
          FROM occur
          WHERE span_key IN (
            SELECT span_key FROM occur
            GROUP BY span_key HAVING count(*) >= {min_occurrences}
          )
        ),
        cutpos AS (
          SELECT DISTINCT doc_id, pos + i AS tpos
          FROM dup_occ, generate_series(0, {span_tokens - 1}) AS g(i)
          WHERE rn > 1
        ),
        tok AS (
          SELECT doc_id, u.tpos - 1 AS tpos, u.tok
          FROM toked, LATERAL (
            SELECT generate_subscripts(__t__, 1) AS tpos, unnest(__t__) AS tok
          ) u
        ),
        kept AS (
          SELECT t.doc_id,
                 CAST(count(*) AS BIGINT) AS nout,
                 string_agg(t.tok, ' ' ORDER BY t.tpos) AS text_out
          FROM tok t
          LEFT JOIN cutpos c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
          WHERE c.doc_id IS NULL
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(len(d.__t__) AS BIGINT) AS n_tokens_in,
               CAST(len(d.__t__) - coalesce(k.nout, 0) AS BIGINT)
                 AS n_tokens_cut,
               coalesce(k.nout, 0) AS n_tokens_out,
               coalesce(k.text_out, '') AS text_rewritten
        FROM toked d LEFT JOIN kept k USING (doc_id)
    """


def text_bigram_logprob_sql(k: float = 1.0, round_digits: int = 4) -> str:
    """Mirror of textqc.bigram_logprob: bigrams from the token list
    (1-based adjacent joins — identical strings to the Spark regex
    windows), add-k smoothed conditional ln, per-doc mean of the
    negative, short docs kept with NULL score."""
    return f"""
        {_DOC_BASE},
        bg AS (
          SELECT doc_id, unnest(
            list_transform(generate_series(1, greatest(len(__t__) - 1, 0)),
                           i -> __t__[i] || ' ' || __t__[i + 1])
          ) AS bg
          FROM toked
        ),
        tok AS (SELECT unnest(__t__) AS token FROM toked),
        uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token),
        vs AS (SELECT count(*) AS v FROM uni),
        bgc AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
        lp AS (
          SELECT bgc.bg,
                 ln((c2 + {float(k)}) / (c1 + {float(k)} * v)) AS lp
          FROM bgc
          JOIN uni ON split_part(bgc.bg, ' ', 1) = uni.token
          CROSS JOIN vs
        ),
        per AS (
          SELECT doc_id, count(*) AS n_bigrams,
                 round(avg(-lp), {round_digits}) AS avg_neg_logprob
          FROM bg JOIN lp USING (bg) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               per.avg_neg_logprob
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


def token_entropy_sql(round_digits: int = 6) -> str:
    """Mirror of textqc.token_entropy: H = log2(n) - (Σ c·log2 c)/n via
    per-token counts (greatest-clamped at 0, the same identity the Spark
    run-length fold computes); ±ulp summation-order noise is absorbed by
    the shared rounding."""
    return f"""
        {_DOC_BASE},
        tok AS (SELECT doc_id, unnest(__t__) AS token FROM toked),
        cnt AS (
          SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
        ),
        s AS (
          SELECT doc_id,
                 sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc
          FROM cnt GROUP BY doc_id
        ),
        ent AS (
          SELECT t.doc_id, len(t.__t__) AS n,
                 len(list_distinct(t.__t__)) AS nd,
                 CASE WHEN len(t.__t__) > 0 THEN
                   greatest(log2(CAST(len(t.__t__) AS DOUBLE))
                            - s.clogc / CAST(len(t.__t__) AS DOUBLE), 0.0)
                 ELSE 0.0 END AS e
          FROM toked t LEFT JOIN s ON t.doc_id = s.doc_id
        )
        SELECT doc_id,
               CAST(n AS INTEGER) AS n_tokens,
               CAST(nd AS INTEGER) AS n_distinct_tokens,
               round(e, {round_digits}) AS token_entropy,
               round(CASE WHEN nd > 1 THEN e / log2(CAST(nd AS DOUBLE))
                     ELSE 0.0 END, {round_digits}) AS norm_entropy
        FROM ent
    """


def readability_sql(round_digits: int = 4) -> str:
    """Mirror of textqc.readability: Flesch-style score from the same
    RE2-compatible regex counts, band cased on the ROUNDED score."""
    return f"""
        WITH base AS (
          SELECT doc_id,
                 len({tokens()}) AS w,
                 greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
                 len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
          FROM documents
        ),
        scored AS (
          SELECT doc_id, w, s, y,
                 CASE WHEN w > 0 THEN
                   round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                         - 84.6 * (y / CAST(w AS DOUBLE)), {round_digits})
                 END AS f
          FROM base
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS n_words,
               CAST(s AS INTEGER) AS n_sentences,
               CAST(y AS INTEGER) AS n_syllables,
               f AS flesch_score,
               CASE WHEN w = 0 THEN 'empty'
                    WHEN f >= 90 THEN 'very_easy'
                    WHEN f >= 60 THEN 'standard'
                    WHEN f >= 30 THEN 'difficult'
                    ELSE 'very_difficult' END AS readability_band
        FROM scored
    """


def mad_outliers_sql(
    table: str,
    value_col: str,
    group_cols: list[str],
    keep_cols: list[str],
    k: float = 3.5,
    round_digits: int = 6,
) -> str:
    """Mirror of profile.mad_outliers: exact interpolating median (DuckDB
    `median` == Spark `median` on doubles), MAD, 0.6745 consistency
    constant, NULL score for constant groups."""
    gsel = ", ".join(group_cols)
    keep = ", ".join(keep_cols)
    return f"""
        WITH med AS (
          SELECT {gsel}, median({value_col}) AS m FROM {table} GROUP BY {gsel}
        ),
        mad AS (
          SELECT t.{group_cols[0]}, median(abs(t.{value_col} - med.m)) AS d
          FROM {table} t JOIN med USING ({gsel}) GROUP BY t.{group_cols[0]}
        )
        SELECT {keep},
               round(med.m, {round_digits}) AS group_median,
               round(mad.d, {round_digits}) AS group_mad,
               round(CASE WHEN mad.d > 0
                     THEN 0.6745 * (t.{value_col} - med.m) / mad.d END,
                     {round_digits}) AS robust_z,
               coalesce(abs(round(CASE WHEN mad.d > 0
                     THEN 0.6745 * (t.{value_col} - med.m) / mad.d END,
                     {round_digits})) > {k}, FALSE) AS is_outlier
        FROM {table} t JOIN med USING ({gsel}) JOIN mad USING ({gsel})
    """


def pivot_orders_sql(round_digits: int = 2) -> str:
    """Mirror of profile.pivot_counts over orders (priority × status):
    manual CASE pivot — count cells 0-filled, sum cells NULL when the
    combination is absent (Spark pivot-sum semantics)."""
    cells = []
    for v in ("F", "O", "P"):
        cells.append(
            f"count(CASE WHEN o_orderstatus = '{v}' THEN 1 END) AS {v}_cnt"
        )
        cells.append(
            f"round(sum(CASE WHEN o_orderstatus = '{v}' THEN o_totalprice END),"
            f" {round_digits}) AS {v}_sum"
        )
    return (
        "SELECT o_orderpriority, "
        + ", ".join(cells)
        + " FROM orders GROUP BY o_orderpriority"
    )


def retention_cohorts_sql(round_digits: int = 6) -> str:
    """Mirror of temporal.retention_cohorts on events/user_id: ISO-week
    cohorts (date_trunc('week') is Monday-start in both engines),
    integer day arithmetic for weeks_since."""
    return f"""
        WITH first AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
                   AS cohort_week
          FROM events GROUP BY user_id
        ),
        joined AS (
          SELECT e.user_id, f.cohort_week,
                 CAST(floor(date_diff('day', f.cohort_week,
                       CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS weeks_since
          FROM events e JOIN first f USING (user_id)
        ),
        sizes AS (
          SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
          FROM joined WHERE weeks_since = 0 GROUP BY cohort_week
        ),
        cells AS (
          SELECT cohort_week, weeks_since, count(DISTINCT user_id) AS n_active
          FROM joined GROUP BY cohort_week, weeks_since
        )
        SELECT c.cohort_week, c.weeks_since,
               CAST(c.n_active AS BIGINT) AS n_active,
               CAST(s.cohort_size AS BIGINT) AS cohort_size,
               round(c.n_active / CAST(s.cohort_size AS DOUBLE),
                     {round_digits}) AS retention
        FROM cells c JOIN sizes s USING (cohort_week)
    """


def rolling_window_agg_sql(
    window_seconds: int = 7 * 86400, round_digits: int = 6, decimals: int = 2
) -> str:
    """Mirror of temporal.rolling_window_agg(decimals=2) on
    events/user_id/value: RANGE frame over integer epoch microseconds
    (epoch_us == Spark unix_micros), trailing window inclusive of peers.
    The frame sum runs over scaled integers so it is exact and immune to
    each engine's float summation order; the avg is one division of that
    exact sum (bit-identical across engines)."""
    lo = window_seconds * 1_000_000
    scale = 10 ** decimals
    frame = (
        f"OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) "
        f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW)"
    )
    s = (
        f"(CAST(sum(CAST(round(value * {scale}) AS BIGINT)) {frame} AS DOUBLE)"
        f" / {float(scale)})"
    )
    n = f"count(value) {frame}"
    return f"""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
               value, props,
               CAST({n} AS BIGINT) AS roll_n,
               round({s}, {round_digits}) AS roll_sum,
               round({s} / CAST({n} AS DOUBLE), {round_digits}) AS roll_avg
        FROM events
    """


def equidepth_histogram_sql(
    table: str = "orders",
    value_col: str = "o_totalprice",
    n_buckets: int = 10,
    round_digits: int = 6,
) -> str:
    """Mirror of profile.equidepth_histogram: quantile_cont boundaries
    (type-7, == Spark exact percentile), ties to the lower bucket."""
    probs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    return f"""
        WITH src AS (
          SELECT CAST({value_col} AS DOUBLE) AS v FROM {table}
          WHERE {value_col} IS NOT NULL
        ),
        b AS (SELECT quantile_cont(v, [{probs}]) AS bounds FROM src),
        tagged AS (
          SELECT v, CAST(len(list_filter(bounds, x -> x < v)) AS INTEGER)
                   AS bucket, bounds
          FROM src, b
        )
        SELECT bucket,
               count(*) AS n_rows,
               round(min(v), {round_digits}) AS min_value,
               round(max(v), {round_digits}) AS max_value,
               round(avg(v), {round_digits}) AS avg_value,
               round(CASE WHEN bucket > 0
                     THEN any_value(bounds)[bucket] END,
                     {round_digits}) AS lo_bound,
               round(CASE WHEN bucket < {n_buckets - 1}
                     THEN any_value(bounds)[bucket + 1] END,
                     {round_digits}) AS hi_bound
        FROM tagged GROUP BY bucket
    """


def asof_nearest_click_sql() -> str:
    """Mirror of catalog.asof_nearest_click: two native DuckDB ASOF
    joins (backward >= and forward <=) with the closer match chosen per
    row, ties to backward — pandas merge_asof 'nearest' semantics."""
    pick = (
        "CASE WHEN b.bts IS NULL THEN f.{f} "
        "WHEN f.fts IS NULL THEN b.{b} "
        "WHEN epoch_us(e.ts) - epoch_us(b.bts) "
        "  <= epoch_us(f.fts) - epoch_us(e.ts) THEN b.{b} "
        "ELSE f.{f} END"
    )
    return f"""
        WITH e AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'error'
        ),
        c0 AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
                 row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS TIMESTAMP)
                   ORDER BY event_id DESC
                 ) AS rn
          FROM events WHERE event_type = 'click'
        ),
        c AS (SELECT user_id, ts, event_id, value FROM c0 WHERE rn = 1),
        b AS (
          SELECT e.event_id, c.ts AS bts, c.event_id AS bid, c.value AS bval
          FROM e ASOF LEFT JOIN c
            ON e.user_id = c.user_id AND e.ts >= c.ts
        ),
        f AS (
          SELECT e.event_id, c.ts AS fts, c.event_id AS fid, c.value AS fval
          FROM e ASOF LEFT JOIN c
            ON e.user_id = c.user_id AND e.ts <= c.ts
        )
        SELECT e.event_id, e.user_id, e.ts, e.value,
               {pick.format(b='bts', f='fts')} AS ts_click,
               {pick.format(b='bid', f='fid')} AS event_id_click,
               {pick.format(b='bval', f='fval')} AS value_click
        FROM e
        LEFT JOIN b ON e.event_id = b.event_id
        LEFT JOIN f ON e.event_id = f.event_id
    """


def fuzzy_match_sql(
    table: str = "customer",
    id_col: str = "c_custkey",
    text_col: str = "c_name",
    max_distance: int = 1,
) -> str:
    """Mirror of fuzzy.fuzzy_match_pairs: identical deletion-neighborhood
    blocking (SymSpell) on the raw deletion keys, identical unit-cost
    levenshtein verification."""
    return f"""
        WITH base AS (
          SELECT {id_col} AS id, lower(trim({text_col})) AS s FROM {table}
          WHERE length(lower(trim({text_col}))) > 0
        ),
        keyed AS (
          SELECT id, unnest(list_append(
            list_transform(generate_series(1, length(s)),
              i -> substr(s, 1, i - 1) || substr(s, i + 1)), s)) AS k
          FROM base
        ),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM keyed a JOIN keyed b ON a.k = b.k AND a.id < b.id
        ),
        pairs AS (
          SELECT id_a, id_b, s1.s AS text_a, s2.s AS text_b
          FROM cand
          JOIN base s1 ON s1.id = cand.id_a
          JOIN base s2 ON s2.id = cand.id_b
        )
        SELECT id_a, id_b, text_a, text_b,
               CAST(levenshtein(text_a, text_b) AS INTEGER) AS distance
        FROM pairs WHERE levenshtein(text_a, text_b) <= {max_distance}
    """


def streaming_sliding_metrics_sql() -> str:
    """Batch equivalent of the 2h-window/1h-slide streaming aggregation:
    every event belongs to exactly duration/slide = 2 hourly-aligned
    windows (Spark's window() start alignment == time_bucket)."""
    return """
        WITH base AS (
          SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        ),
        w AS (
          SELECT unnest([
                   time_bucket(INTERVAL 1 HOUR, ts),
                   time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR
                 ]) AS window_start,
                 ts, event_type, value
          FROM base
        )
        SELECT window_start,
               window_start + INTERVAL 2 HOUR AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               round(round(sum(value), 6) / count(*), 6) AS avg_value
        FROM w
        WHERE ts >= window_start AND ts < window_start + INTERVAL 2 HOUR
        GROUP BY 1, 2, 3
    """


def drift_chi2_priority_sql(round_digits: int = 6) -> str:
    """Mirror of catalog.drift_chi2_priority: chi-square homogeneity
    terms per category, same pooled-expectation arithmetic, NULLs folded
    to '__NULL__'."""
    return f"""
        WITH ref AS (
          SELECT coalesce(CAST(o_orderpriority AS VARCHAR), '__NULL__')
                   AS category, count(*) AS n_ref
          FROM orders GROUP BY 1
        ),
        cur0 AS (
          SELECT CASE WHEN o_orderkey % 7 = 0 THEN '1-URGENT'
                      ELSE o_orderpriority END AS p
          FROM orders
        ),
        cur AS (
          SELECT coalesce(CAST(p AS VARCHAR), '__NULL__') AS category,
                 count(*) AS n_cur
          FROM cur0 GROUP BY 1
        ),
        j AS (
          SELECT coalesce(ref.category, cur.category) AS category,
                 coalesce(n_ref, 0) AS n_ref,
                 coalesce(n_cur, 0) AS n_cur
          FROM ref FULL OUTER JOIN cur ON ref.category = cur.category
        ),
        t AS (
          SELECT *,
                 CAST(sum(n_ref) OVER () AS DOUBLE) AS nr,
                 CAST(sum(n_cur) OVER () AS DOUBLE) AS nc
          FROM j
        )
        SELECT category,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               round(n_ref / nr, {round_digits}) AS frac_ref,
               round(n_cur / nc, {round_digits}) AS frac_cur,
               round(CASE WHEN (n_ref + n_cur) * nr / (nr + nc) > 0
                           AND (n_ref + n_cur) * nc / (nr + nc) > 0 THEN
                 (n_ref - (n_ref + n_cur) * nr / (nr + nc))
                 * (n_ref - (n_ref + n_cur) * nr / (nr + nc))
                 / ((n_ref + n_cur) * nr / (nr + nc))
                 + (n_cur - (n_ref + n_cur) * nc / (nr + nc))
                 * (n_cur - (n_ref + n_cur) * nc / (nr + nc))
                 / ((n_ref + n_cur) * nc / (nr + nc))
               ELSE 0.0 END, {round_digits}) AS chi2_term
        FROM t
    """


def trend_per_key_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    decimals: int = 2,
    round_digits: int = 6,
) -> str:
    """Mirror of temporal.trend_per_key: least squares over EXACT
    integer sums (epoch-day x, scaled-integer y); the only float steps
    are the final divisions, identical in both engines."""
    scale = 10 ** decimals
    return f"""
        WITH base AS (
          SELECT {key_col} AS k,
                 date_diff('day', DATE '1970-01-01',
                           CAST(CAST({ts_col} AS TIMESTAMP) AS DATE)) AS x,
                 CAST(round({value_col} * {scale}) AS BIGINT) AS y
          FROM {table}
        ),
        g AS (
          SELECT k, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM base GROUP BY k
        ),
        t AS (
          SELECT k, n,
                 CAST(n * sxy - sx * sy AS DOUBLE) AS num,
                 CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
                 CAST(n * syy - sy * sy AS DOUBLE) AS deny,
                 sx, sy
          FROM g
        ),
        s AS (SELECT *, num / denx AS slope_c FROM t)
        SELECT k AS {key_col},
               CAST(n AS BIGINT) AS n_points,
               round(CASE WHEN denx <> 0
                     THEN slope_c / {scale} END, {round_digits})
                 AS slope_per_day,
               round(CASE WHEN denx <> 0
                     THEN ((sy - slope_c * sx) / n) / {scale} END,
                     {round_digits}) AS intercept,
               round(CASE WHEN denx <> 0 AND deny <> 0
                     THEN (num * num) / (denx * deny) END, {round_digits})
                 AS r2
        FROM s
    """


def interval_price_band_sql() -> str:
    """Mirror of catalog.interval_price_band: the chunked equi-join is
    an execution strategy only — the oracle states the declarative
    containment predicate directly (DuckDB's IEJoin handles it) and the
    same exact scaled-integer revenue sum."""
    return """
        WITH bands AS (
          SELECT n_nationkey AS band_id,
                 CAST(n_nationkey * n_nationkey * 400 AS DOUBLE) AS lo,
                 CAST((n_nationkey + 1) * (n_nationkey + 1) * 400
                      AS DOUBLE) AS hi
          FROM nation
        )
        SELECT band_id, lo, hi,
               COUNT(*) AS n_orders,
               round(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                     / 100.0, 2) AS sum_totalprice
        FROM orders
        JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band_id, lo, hi
    """


def scd2_customer_segment_sql() -> str:
    """Mirror of catalog.scd2_customer_segment: the same derived update
    batch and the SCD2 case analysis (passthrough / close+insert /
    new-key insert) as explicit set algebra — full outer join + two
    unions with IS DISTINCT FROM change detection (the SQL spelling of
    Spark's null-safe <=>)."""
    return """
        WITH cur AS (
          SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS acctbal,
                 DATE '1992-01-01' AS valid_from,
                 CAST(NULL AS DATE) AS valid_to,
                 TRUE AS is_current
          FROM customer
        ),
        upd AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY'
                      ELSE c_mktsegment END AS segment,
                 round(c_acctbal + CASE WHEN c_custkey % 2 = 0
                                        THEN 50.25 ELSE 0.0 END, 2)
                   AS acctbal,
                 DATE '1996-06-01' AS eff
          FROM customer WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey + 1000000, 'NEWSEG', 0.0, DATE '1996-06-01'
          FROM customer WHERE c_custkey <= 5
        ),
        j AS (
          SELECT cur.c_custkey AS ck, upd.c_custkey AS uk,
                 cur.segment AS cseg, cur.acctbal AS cbal,
                 cur.valid_from AS vf,
                 upd.segment AS useg, upd.acctbal AS ubal, upd.eff AS eff,
                 (cur.segment IS DISTINCT FROM upd.segment
                  OR cur.acctbal IS DISTINCT FROM upd.acctbal) AS changed
          FROM cur FULL OUTER JOIN upd ON cur.c_custkey = upd.c_custkey
        )
        SELECT ck AS c_custkey, cseg AS segment, cbal AS acctbal,
               vf AS valid_from,
               CASE WHEN uk IS NOT NULL AND changed THEN eff END
                 AS valid_to,
               NOT (uk IS NOT NULL AND changed) AS is_current
        FROM j WHERE ck IS NOT NULL
        UNION ALL
        SELECT uk, useg, ubal, eff, CAST(NULL AS DATE), TRUE
        FROM j WHERE uk IS NOT NULL AND (ck IS NULL OR changed)
    """


def token_rank_shift_sql(
    ref_where: str,
    cur_where: str,
    vocab_k: int = 200,
    k: int = 20,
) -> str:
    """Mirror of drift.token_rank_shift over documents: per-slice top
    vocab_k leaderboards, full-outer join, off-board rank = vocab_k+1,
    top-k climbers."""
    off = vocab_k + 1
    tok = tokens("text")

    def board(where: str, n: str, r: str) -> str:
        return f"""(
          SELECT token, {n}, CAST(row_number() OVER (
                   ORDER BY {n} DESC, token ASC) AS INTEGER) AS {r}
          FROM (
            SELECT token, count(*) AS {n}
            FROM (SELECT unnest({tok}) AS token FROM documents
                  WHERE {where})
            GROUP BY token
            ORDER BY {n} DESC, token ASC
            LIMIT {vocab_k}
          )
        )"""
    return f"""
        WITH a AS {board(ref_where, "n_ref", "rank_ref")},
        b AS {board(cur_where, "n_cur", "rank_cur")},
        joined AS (
          SELECT COALESCE(a.token, b.token) AS token,
                 CAST(COALESCE(a.n_ref, 0) AS BIGINT) AS n_ref,
                 CAST(COALESCE(b.n_cur, 0) AS BIGINT) AS n_cur,
                 COALESCE(a.rank_ref, {off}) AS rank_ref,
                 COALESCE(b.rank_cur, {off}) AS rank_cur
          FROM a FULL OUTER JOIN b ON a.token = b.token
        )
        SELECT token, n_ref, n_cur, rank_ref, rank_cur,
               rank_ref - rank_cur AS rank_shift,
               CAST(row_number() OVER (
                 ORDER BY rank_ref - rank_cur DESC, token ASC)
                 AS INTEGER) AS rank
        FROM joined
        ORDER BY rank_shift DESC, token ASC
        LIMIT {k}
    """


def token_drift_sql(
    ref_where: str, cur_where: str, round_digits: int = 6
) -> str:
    """Mirror of drift.token_distribution_drift: Laplace-smoothed unigram
    KL/JS over the joint vocabulary of two document slices."""
    tok = tokens("text")
    return f"""
        WITH va AS (
          SELECT t AS token, count(*) AS n_ref
          FROM (SELECT unnest({tok}) AS t
                FROM documents WHERE {ref_where})
          GROUP BY t
        ),
        vb AS (
          SELECT t AS token, count(*) AS n_cur
          FROM (SELECT unnest({tok}) AS t
                FROM documents WHERE {cur_where})
          GROUP BY t
        ),
        j AS (
          SELECT coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
          FROM va FULL OUTER JOIN vb ON va.token = vb.token
        ),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS v,
                 CAST(sum(n_ref) AS BIGINT) AS tr,
                 CAST(sum(n_cur) AS BIGINT) AS tc
          FROM j
        ),
        pq AS (
          SELECT v, tr, tc,
                 CAST(n_ref + 1 AS DOUBLE) / CAST(tr + v AS DOUBLE) AS p,
                 CAST(n_cur + 1 AS DOUBLE) / CAST(tc + v AS DOUBLE) AS q
          FROM j, tot
        )
        SELECT v AS vocab_size, tr AS n_tokens_ref, tc AS n_tokens_cur,
               round(sum(p * ln(p / q)), {round_digits}) AS kl_ref_cur,
               round(sum(q * ln(q / p)), {round_digits}) AS kl_cur_ref,
               round(sum(0.5 * p * ln(p / ((p + q) / 2.0))
                         + 0.5 * q * ln(q / ((p + q) / 2.0))),
                     {round_digits}) AS js_divergence
        FROM pq
        GROUP BY v, tr, tc
    """


def vocab_overlap_sql(group_col: str = "lang", round_digits: int = 6) -> str:
    """Mirror of textqc.vocab_overlap: pairwise vocabulary Jaccard
    between corpus slices."""
    tok = tokens("text")
    return f"""
        WITH v AS (
          SELECT DISTINCT g, t AS token
          FROM (SELECT {group_col} AS g, unnest({tok}) AS t
                FROM documents)
        ),
        s AS (SELECT g, CAST(count(*) AS BIGINT) AS vocab_size
              FROM v GROUP BY g),
        i AS (
          SELECT a.g AS group_a, b.g AS group_b,
                 CAST(count(*) AS BIGINT) AS shared_tokens
          FROM v a JOIN v b ON a.token = b.token AND a.g < b.g
          GROUP BY 1, 2
        )
        SELECT group_a, group_b,
               sa.vocab_size AS vocab_a, sb.vocab_size AS vocab_b,
               shared_tokens,
               round(CAST(shared_tokens AS DOUBLE)
                     / CAST(sa.vocab_size + sb.vocab_size - shared_tokens
                            AS DOUBLE), {round_digits}) AS jaccard
        FROM i
        JOIN s sa ON sa.g = i.group_a
        JOIN s sb ON sb.g = i.group_b
    """


def dsir_weights_sql(
    target_predicate: str,
    n_buckets: int = 512,
    k_select: int = 100,
    smooth: float = 1.0,
    scale: int = 1000,
    salt: str = "dsir",
) -> str:
    """Mirror of curation.dsir_weights over documents: hashed
    unigram+bigram buckets, smoothed p/q bucket models, fixed-point
    log-ratio weights, deterministic md5-Gumbel top-k selection."""
    tok = tokens("text")
    s = repr(float(smooth))
    sb = repr(float(smooth) * n_buckets)
    sc = repr(float(scale))
    feat_unnest = (
        "unnest(list_concat(__t__, "
        "list_transform(CASE WHEN len(__t__) >= 2 "
        "THEN generate_series(1, len(__t__) - 1) ELSE [] END, "
        "i -> __t__[i] || ' ' || __t__[i + 1])))"
    )

    def bucket(feat_expr: str) -> str:
        return (
            f"CAST(CAST(('0x' || substr(md5('{salt}:' || {feat_expr}), 1, 8))"
            f" AS BIGINT) % {n_buckets} AS INT)"
        )

    return f"""
        WITH rawt AS (SELECT doc_id, {tok} AS __t__ FROM documents),
        rawf AS (
          SELECT doc_id, {feat_unnest} AS feat FROM rawt
        ),
        docbkt AS MATERIALIZED (
          SELECT doc_id, {bucket('feat')} AS b, count(*) AS c
          FROM rawf GROUP BY 1, 2
        ),
        q AS (SELECT b, sum(c) AS c_q FROM docbkt GROUP BY b),
        tgtt AS (
          SELECT {tok} AS __t__ FROM documents WHERE {target_predicate}
        ),
        p AS (
          SELECT b, count(*) AS c_p FROM (
            SELECT {bucket('feat')} AS b FROM (
              SELECT {feat_unnest} AS feat FROM tgtt
            )
          ) GROUP BY b
        ),
        nq AS (SELECT sum(c_q) AS nq FROM q),
        np AS (SELECT sum(c_p) AS np FROM p),
        lam AS (
          SELECT q.b,
                 CAST(round((ln((coalesce(p.c_p, 0) + {s})
                                / (coalesce(np.np, 0) + {sb}))
                             - ln((q.c_q + {s}) / (nq.nq + {sb})))
                            * {sc}) AS BIGINT) AS lam
          FROM q LEFT JOIN p USING (b), nq, np
        ),
        scored AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_features,
                 CAST(sum(c * lam) AS BIGINT) AS logw_milli
          FROM docbkt JOIN lam USING (b) GROUP BY doc_id
        ),
        keyed AS (
          SELECT d.doc_id,
                 coalesce(s.n_features, 0) AS n_features,
                 coalesce(s.logw_milli, 0) AS logw_milli,
                 CAST(round(-ln(-ln((CAST(('0x' || substr(md5('{salt}g:'
                        || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        + 0.5) / 4294967296.0)) * {sc}) AS BIGINT)
                   AS gumbel_milli,
                 coalesce(s.logw_milli, 0)
                   + CAST(round(-ln(-ln((CAST(('0x' || substr(md5('{salt}g:'
                        || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        + 0.5) / 4294967296.0)) * {sc}) AS BIGINT)
                   AS key_milli
          FROM (SELECT doc_id FROM documents) d
          LEFT JOIN scored s USING (doc_id)
        ),
        winners AS (
          SELECT doc_id FROM keyed
          ORDER BY key_milli DESC, doc_id ASC LIMIT {k_select}
        )
        SELECT k.doc_id, k.n_features, k.logw_milli, k.gumbel_milli,
               k.key_milli, (w.doc_id IS NOT NULL) AS selected
        FROM keyed k LEFT JOIN winners w USING (doc_id)
    """


def vocab_coverage_sql(
    max_log2_k: int = 10,
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.vocab_coverage over documents: top-2^max ranked
    counts, cumulative sums, powers-of-two checkpoints."""
    tok = tokens("text")
    powers = ", ".join(str(2 ** i) for i in range(max_log2_k + 1))
    return f"""
        WITH counts AS (
          SELECT t AS token, count(*) AS cnt
          FROM (SELECT unnest({tok}) AS t FROM documents)
          GROUP BY t
        ),
        tot AS (
          SELECT CAST(sum(cnt) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS v
          FROM counts
        ),
        top AS (
          SELECT cnt,
                 row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
                 CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
          FROM (SELECT * FROM counts ORDER BY cnt DESC, token ASC
                LIMIT {2 ** max_log2_k})
        ),
        spine AS (SELECT unnest([{powers}]) AS k)
        SELECT CAST(s.k AS BIGINT) AS k,
               least(CAST(s.k AS BIGINT), tot.v) AS vocab_available,
               t.cum AS covered_tokens,
               tot.total AS total_tokens,
               round(CAST(t.cum AS DOUBLE) / CAST(tot.total AS DOUBLE),
                     {round_digits}) AS coverage
        FROM spine s, tot
        JOIN top t ON t.rank = least(CAST(s.k AS BIGINT), tot.v)
    """


def c4_rules_sql(
    min_sentences: int = 3,
    min_line_words: int = 5,
) -> str:
    """Mirror of textqc.c4_rules over documents: identical line split,
    per-line retention predicate, kept-text sentence count, page
    flags."""
    line_ok = (
        f"right(trim(l), 1) IN ('.', '!', '?', '\"') "
        f"AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), "
        f"w -> w <> '')) >= {min_line_words} "
        f"AND NOT contains(lower(trim(l)), 'javascript')"
    )
    return f"""
        WITH base AS (
          SELECT doc_id, text,
                 string_split(text, chr(10)) AS lines,
                 list_filter(string_split(text, chr(10)),
                             l -> {line_ok}) AS kept
          FROM documents
        ),
        scored AS (
          SELECT doc_id,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(len(kept) AS BIGINT) AS n_kept_lines,
                 CAST(len(regexp_extract_all(
                        coalesce(array_to_string(kept, chr(10)), ''),
                        '[.!?]'))
                      AS BIGINT) AS n_sentences,
                 contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
                 contains(text, '{{') AS has_brace
          FROM base
        )
        SELECT doc_id, n_lines, n_kept_lines, n_sentences,
               has_lorem_ipsum, has_brace,
               (n_sentences >= {min_sentences}
                AND NOT has_lorem_ipsum
                AND NOT has_brace) AS keep
        FROM scored
    """


def zipf_fit_sql(
    vocab_k: int = 200,
    scale: int = 1000,
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.zipf_fit over documents: top-k token counts,
    milli-nat fixed-point (ln rank, ln count), exact BIGINT regression
    sums, single double divisions."""
    tok = tokens("text")
    sc = repr(float(scale))
    return f"""
        WITH counts AS (
          SELECT t AS token, count(*) AS cnt
          FROM (SELECT unnest({tok}) AS t FROM documents)
          GROUP BY t
        ),
        ranked AS (
          SELECT cnt,
                 row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
          FROM (
            SELECT * FROM counts ORDER BY cnt DESC, token ASC
            LIMIT {vocab_k}
          )
        ),
        pts AS (
          SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * {sc}) AS BIGINT)
                   AS x,
                 CAST(round(ln(CAST(cnt AS DOUBLE)) * {sc}) AS BIGINT)
                   AS y
          FROM ranked
        ),
        sums AS (
          SELECT count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM pts
        )
        SELECT n AS n_vocab,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE),
                            {round_digits}) END AS slope,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round(-(CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)),
                            {round_digits}) END AS alpha,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round((CAST(sy AS DOUBLE)
                             - (CAST(n * sxy - sx * sy AS DOUBLE)
                                / CAST(n * sxx - sx * sx AS DOUBLE))
                               * CAST(sx AS DOUBLE))
                            / CAST(n AS DOUBLE) / {sc},
                            {round_digits}) END AS intercept,
               CASE WHEN n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                 THEN round((CAST(n * sxy - sx * sy AS DOUBLE)
                             * CAST(n * sxy - sx * sy AS DOUBLE))
                            / (CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)),
                            {round_digits}) END AS r2
        FROM sums
    """


def heaps_fit_sql(
    n_checkpoints: int = 10,
    scale: int = 1000,
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.heaps_fit over documents: id-grid prefix cells,
    first-occurrence vocabulary accounting, cumulative cell sums,
    milli-nat integer regression (the zipf_fit arithmetic), and
    K = exp(intercept)."""
    tok = tokens("text")
    m = n_checkpoints
    sc = repr(float(scale))
    cell = (
        f"CAST(least(greatest(floor(({{v}} - mn) / width), 0), {m - 1}) "
        f"AS INT)"
    )
    return f"""
        WITH toked AS (
          SELECT CAST(doc_id AS DOUBLE) AS id, {tok} AS __t__
          FROM documents
        ),
        stats AS (
          SELECT min(id) AS mn, (max(id) - min(id)) / {m} AS width
          FROM toked
        ),
        perdoc AS (
          SELECT cell, sum(ntok) AS tok_in_cell FROM (
            SELECT {cell.format(v='id')} AS cell,
                   CAST(len(__t__) AS BIGINT) AS ntok
            FROM toked, stats
          ) GROUP BY cell
        ),
        fs AS (
          SELECT cell, count(*) AS new_in_cell FROM (
            SELECT {cell.format(v='first_id')} AS cell FROM (
              SELECT min(id) AS first_id
              FROM (SELECT id, unnest(__t__) AS t FROM toked)
              GROUP BY t
            ), stats
          ) GROUP BY cell
        ),
        pts AS (
          SELECT x, y FROM (
            SELECT s.cell,
                   sum(coalesce(p.tok_in_cell, 0)) OVER (
                     ORDER BY s.cell ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS N,
                   sum(coalesce(f.new_in_cell, 0)) OVER (
                     ORDER BY s.cell ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS V
            FROM (SELECT unnest(generate_series(0, {m - 1})) AS cell) s
            LEFT JOIN perdoc p ON p.cell = s.cell
            LEFT JOIN fs f ON f.cell = s.cell
          ), LATERAL (
            SELECT CAST(round(ln(CAST(N AS DOUBLE)) * {sc}) AS BIGINT)
                     AS x,
                   CAST(round(ln(CAST(V AS DOUBLE)) * {sc}) AS BIGINT)
                     AS y
          )
          WHERE N > 0 AND V > 0
        ),
        sums AS (
          SELECT count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM pts
        )
        SELECT n AS n_points,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE),
                            {round_digits}) END AS beta,
               CASE WHEN n * sxx - sx * sx > 0
                 THEN round(exp((CAST(sy AS DOUBLE)
                             - (CAST(n * sxy - sx * sy AS DOUBLE)
                                / CAST(n * sxx - sx * sx AS DOUBLE))
                               * CAST(sx AS DOUBLE))
                            / CAST(n AS DOUBLE) / {sc}),
                            {round_digits}) END AS k_coef,
               CASE WHEN n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                 THEN round((CAST(n * sxy - sx * sy AS DOUBLE)
                             * CAST(n * sxy - sx * sy AS DOUBLE))
                            / (CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)),
                            {round_digits}) END AS r2
        FROM sums
    """


def nb_train_score_sql(
    label_predicate: str,
    scale: int = 1000,
) -> str:
    """Mirror of textqc.nb_train_score over documents: add-1 multinomial
    NB weights in milli-nats (identical double expression trees), doc
    priors for the bias, integer score sum, prediction at > 0."""
    tok = tokens("text")
    sc = repr(float(scale))
    return f"""
        WITH lab AS (
          SELECT doc_id, ({label_predicate}) AS y, {tok} AS __t__
          FROM documents WHERE ({label_predicate}) IS NOT NULL
        ),
        pri AS (
          SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
                 sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn
          FROM lab
        ),
        b AS (
          SELECT CAST(round((ln(CAST(np AS DOUBLE)) - ln(CAST(nn AS DOUBLE)))
                            * {scale}) AS BIGINT) AS bias
          FROM pri
        ),
        tokc AS MATERIALIZED (
          SELECT token,
                 sum(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
                 sum(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
          FROM (SELECT y, unnest(__t__) AS token FROM lab)
          GROUP BY token
        ),
        tot AS (
          SELECT sum(c_pos) AS n1, sum(c_neg) AS n0, count(*) AS v
          FROM tokc
        ),
        w AS MATERIALIZED (
          SELECT token,
                 CAST(round((ln((c_pos + 1) / (n1 + v))
                             - ln((c_neg + 1) / (n0 + v))) * {sc})
                      AS BIGINT) AS wm
          FROM tokc, tot
        ),
        pd AS (
          SELECT doc_id, count(*) AS n_tokens, sum(wm) AS sw
          FROM (SELECT doc_id, unnest(__t__) AS token FROM lab)
          JOIN w USING (token)
          GROUP BY doc_id
        )
        SELECT l.doc_id,
               l.y AS label_positive,
               CAST(coalesce(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(b.bias + coalesce(pd.sw, 0) AS BIGINT) AS score_milli,
               (b.bias + coalesce(pd.sw, 0)) > 0 AS predicted_positive,
               ((b.bias + coalesce(pd.sw, 0)) > 0) = l.y AS correct
        FROM lab l LEFT JOIN pd USING (doc_id), b
    """


def stupid_backoff_sql(
    ref_predicate: str,
    alpha: float = 0.4,
    round_digits: int = 4,
) -> str:
    """Mirror of textqc.stupid_backoff over documents: trigram counts
    from the reference slice, per-position CASE over the backoff ladder
    with the identical double expressions (ratios of exact integer
    counts, α and α² as the same Python float literals), avg + round."""
    tok = tokens("text")
    a = repr(float(alpha))
    a2 = repr(float(alpha) * float(alpha))
    return f"""
        WITH ref AS (
          SELECT {tok} AS __t__ FROM documents WHERE {ref_predicate}
        ),
        uni AS MATERIALIZED (
          SELECT t AS w, count(*) AS c1
          FROM (SELECT unnest(__t__) AS t FROM ref) GROUP BY t
        ),
        nn AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
        bi AS MATERIALIZED (
          SELECT bg, count(*) AS c2 FROM (
            SELECT __t__[i] || ' ' || __t__[i + 1] AS bg
            FROM (SELECT __t__,
                         unnest(generate_series(1, len(__t__) - 1)) AS i
                  FROM ref)
          ) GROUP BY bg
        ),
        tri AS MATERIALIZED (
          SELECT tg, count(*) AS c3 FROM (
            SELECT __t__[i] || ' ' || __t__[i + 1] || ' ' || __t__[i + 2]
                     AS tg
            FROM (SELECT __t__,
                         unnest(generate_series(1, len(__t__) - 2)) AS i
                  FROM ref)
          ) GROUP BY tg
        ),
        tgt AS (SELECT doc_id, {tok} AS __t__ FROM documents),
        pos AS (
          SELECT doc_id, __t__[i] AS w1, __t__[i + 1] AS w2,
                 __t__[i + 2] AS w3
          FROM (SELECT doc_id, __t__,
                       unnest(generate_series(1, len(__t__) - 2)) AS i
                FROM tgt)
        ),
        scored AS (
          SELECT p.doc_id,
                 CASE WHEN t.c3 IS NOT NULL THEN 0
                      WHEN bs.c2 IS NOT NULL THEN 1
                      WHEN u3.c1 IS NOT NULL THEN 2
                      ELSE 3 END AS lvl,
                 CASE WHEN t.c3 IS NOT NULL
                      THEN -ln(CAST(t.c3 AS DOUBLE) / CAST(bp.c2 AS DOUBLE))
                      WHEN bs.c2 IS NOT NULL
                      THEN -ln({a} * CAST(bs.c2 AS DOUBLE)
                               / CAST(u2.c1 AS DOUBLE))
                      WHEN u3.c1 IS NOT NULL
                      THEN -ln({a2} * CAST(u3.c1 AS DOUBLE) / nn.n)
                      ELSE -ln({a2} / nn.n) END AS nls
          FROM pos p
          LEFT JOIN tri t ON t.tg = p.w1 || ' ' || p.w2 || ' ' || p.w3
          LEFT JOIN bi bp ON bp.bg = p.w1 || ' ' || p.w2
          LEFT JOIN bi bs ON bs.bg = p.w2 || ' ' || p.w3
          LEFT JOIN uni u2 ON u2.w = p.w2
          LEFT JOIN uni u3 ON u3.w = p.w3, nn
        ),
        agg AS (
          SELECT doc_id,
                 count(*) AS n_trigrams,
                 CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tri_hit,
                 CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bi_backoff,
                 CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_uni_backoff,
                 CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unseen,
                 round(avg(nls), {round_digits}) AS avg_neg_logscore
          FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_trigrams, 0) AS n_trigrams,
               coalesce(a.n_tri_hit, 0) AS n_tri_hit,
               coalesce(a.n_bi_backoff, 0) AS n_bi_backoff,
               coalesce(a.n_uni_backoff, 0) AS n_uni_backoff,
               coalesce(a.n_unseen, 0) AS n_unseen,
               a.avg_neg_logscore
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN agg a USING (doc_id)
    """


def kmv_group_jaccard_sql(
    group_col: str = "source",
    k: int = 128,
    salt: str = "kmvset",
    round_digits: int = 6,
) -> str:
    """Mirror of sketch.kmv_group_jaccard(grade_exact=True) over
    documents tokens: per-group bottom-k md5 sketches, union bottom-k
    per pair, the (k−1)/h_k estimator with the first-8-hex-digits
    unit-interval mapping, plus the exact-vocab grading join."""
    tok = tokens("text")
    kd = float(k - 1)
    return f"""
        WITH dv AS (
          SELECT DISTINCT g, md5('{salt}:' || t) AS h
          FROM (SELECT {group_col} AS g, unnest({tok}) AS t
                FROM documents)
        ),
        sk AS (
          SELECT g, h FROM (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM dv
          ) WHERE rn <= {k}
        ),
        pairs AS (
          SELECT a.g AS group_a, b.g AS group_b
          FROM (SELECT DISTINCT g FROM sk) a,
               (SELECT DISTINCT g FROM sk) b
          WHERE a.g < b.g
        ),
        tagged AS (
          SELECT p.group_a, p.group_b, sk.h, 1 AS in_a, 0 AS in_b
          FROM sk JOIN pairs p ON sk.g = p.group_a
          UNION ALL
          SELECT p.group_a, p.group_b, sk.h, 0, 1
          FROM sk JOIN pairs p ON sk.g = p.group_b
        ),
        u AS (
          SELECT group_a, group_b, h,
                 max(in_a) AS in_a, max(in_b) AS in_b
          FROM tagged GROUP BY 1, 2, 3
        ),
        uk AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY group_a, group_b ORDER BY h) AS rn
            FROM u
          ) WHERE rn <= {k}
        ),
        per_pair AS (
          SELECT group_a, group_b,
                 count(*) AS n_union_sk,
                 CAST(sum(in_a * in_b) AS BIGINT) AS shared_sk,
                 max(h) AS hk
          FROM uk GROUP BY 1, 2
        ),
        est AS (
          SELECT group_a, group_b, n_union_sk, shared_sk,
                 CASE WHEN n_union_sk < {k}
                      THEN CAST(n_union_sk AS DOUBLE)
                      ELSE {kd!r} / (CAST(CAST(('0x' || substr(hk, 1, 8))
                                AS BIGINT) AS DOUBLE) / 4294967296.0)
                 END AS est_union_raw,
                 CAST(shared_sk AS DOUBLE) / CAST(n_union_sk AS DOUBLE)
                   AS jac_raw
          FROM per_pair
        ),
        sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM dv GROUP BY g),
        inter AS (
          SELECT a.g AS group_a, b.g AS group_b,
                 CAST(count(*) AS BIGINT) AS shared_exact
          FROM dv a JOIN dv b ON a.h = b.h AND a.g < b.g
          GROUP BY 1, 2
        )
        SELECT e.group_a, e.group_b,
               CAST(n_union_sk AS BIGINT) AS n_union_sk, shared_sk,
               round(est_union_raw, {round_digits}) AS est_union,
               round(jac_raw, {round_digits}) AS est_jaccard,
               round(jac_raw * est_union_raw, {round_digits})
                 AS est_intersection,
               sa.n AS vocab_a, sb.n AS vocab_b,
               coalesce(i.shared_exact, 0) AS shared_exact,
               round(CAST(coalesce(i.shared_exact, 0) AS DOUBLE)
                     / CAST(sa.n + sb.n - coalesce(i.shared_exact, 0)
                            AS DOUBLE), {round_digits}) AS exact_jaccard,
               round(abs(round(jac_raw, {round_digits})
                         - round(CAST(coalesce(i.shared_exact, 0) AS DOUBLE)
                                 / CAST(sa.n + sb.n
                                        - coalesce(i.shared_exact, 0)
                                        AS DOUBLE), {round_digits})),
                     {round_digits}) AS jaccard_abs_err
        FROM est e
        LEFT JOIN inter i ON i.group_a = e.group_a AND i.group_b = e.group_b
        JOIN sizes sa ON sa.g = e.group_a
        JOIN sizes sb ON sb.g = e.group_b
    """


def ewma_per_key_sql(
    terms: int = 16, decimals: int = 2, round_digits: int = 6
) -> str:
    """Mirror of temporal.ewma_per_key on events: identical power-of-two
    weights over scaled integers, so the smoothed value is bit-exact."""
    scale = 10 ** decimals
    win = "PARTITION BY user_id ORDER BY ts, event_id"
    lag_defs = []
    num_parts = []
    den_parts = []
    for k in range(terms):
        wt = repr(2.0 ** -k)
        src = "v" if k == 0 else f"lag(v, {k}) OVER ({win})"
        lag_defs.append(f"{src} AS l{k}")
        num_parts.append(
            f"coalesce(CAST(l{k} AS DOUBLE) * CAST({wt} AS DOUBLE), 0.0)"
        )
        den_parts.append(
            f"CASE WHEN l{k} IS NOT NULL THEN CAST({wt} AS DOUBLE) "
            f"ELSE 0.0 END"
        )
    lags = ",\n                 ".join(lag_defs)
    num = "\n                 + ".join(num_parts)
    den = "\n                 + ".join(den_parts)
    return f"""
        WITH b AS (
          SELECT user_id, ts, event_id, value,
                 CAST(round(value * {scale}) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ),
        l AS (
          SELECT user_id, ts, event_id, value,
                 {lags}
          FROM b
        )
        SELECT user_id, ts, event_id, value,
               round(({num})
                     / ({den})
                     / CAST({float(scale)} AS DOUBLE),
                     {round_digits}) AS ewma
        FROM l
    """


def rolling_zscore_sql(
    window_rows: int = 20,
    threshold: float = 3.0,
    min_rows: int = 12,
    decimals: int = 2,
    round_digits: int = 4,
) -> str:
    """Mirror of temporal.rolling_zscore_anomalies on events: exact
    integer window sums assembled into one fixed double expression."""
    scale = 10 ** decimals
    return f"""
        WITH b AS (
          SELECT user_id, ts, event_id, value,
                 CAST(round(value * {scale}) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ),
        w AS (
          SELECT user_id, ts, event_id, value, v,
                 CAST(count(*) OVER win AS BIGINT) AS n,
                 CAST(sum(v) OVER win AS BIGINT) AS s1,
                 CAST(sum(v * v) OVER win AS BIGINT) AS s2
          FROM b
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {window_rows - 1} PRECEDING
                         AND CURRENT ROW)
        ),
        z AS (
          SELECT user_id, ts, event_id, value, n AS n_window,
                 CASE WHEN n >= {min_rows} AND n * s2 - s1 * s1 > 0
                      THEN round(CAST(n * v - s1 AS DOUBLE)
                                 / sqrt(CAST(n * (n * s2 - s1 * s1)
                                             AS DOUBLE)
                                        / CAST(n - 1 AS DOUBLE)),
                                 {round_digits})
                 END AS zscore
          FROM w
        )
        SELECT * FROM z WHERE abs(zscore) > {threshold}
    """


def embedding_decontaminate_sql(
    dim: int = 64,
    threshold: float = 0.25,
    n_planes: int = 4,
    bench_mod: int = 41,
    round_digits: int = 6,
) -> str:
    """Mirror of curation.embedding_decontaminate on the embeddings
    table: corpus = vec_id % bench_mod != 0, benchmark = the rest,
    identical SRP buckets and cosine fold."""
    return f"""
        WITH base AS (
          SELECT vec_id, embedding AS vec,
                 {srp_bucket('embedding', dim, n_planes)} AS bucket
          FROM embeddings
        ),
        c AS (SELECT vec_id AS corpus_id, vec, bucket FROM base
              WHERE vec_id % {bench_mod} != 0),
        b AS (SELECT vec_id AS bench_id, vec, bucket FROM base
              WHERE vec_id % {bench_mod} = 0)
        SELECT corpus_id, bench_id,
               round({cosine('c.vec', 'b.vec', dim)}, {round_digits})
                 AS cos_sim
        FROM c JOIN b ON c.bucket = b.bucket
        WHERE round({cosine('c.vec', 'b.vec', dim)}, {round_digits})
              >= {threshold}
    """


def interarrival_stats_sql(round_digits: int = 6) -> str:
    """Mirror of temporal.interarrival_stats on events: integer-micros
    gaps via lag, exact min/max/sum, one final rounded division."""
    return f"""
        WITH g AS (
          SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_us
          FROM events
        ),
        a AS (
          SELECT user_id,
                 count(*) AS n_events,
                 count(gap_us) AS n_gaps,
                 CAST(min(gap_us) AS BIGINT) AS mn,
                 CAST(max(gap_us) AS BIGINT) AS mx,
                 CAST(sum(gap_us) AS BIGINT) AS sm
          FROM g GROUP BY user_id
        )
        SELECT user_id, n_events, n_gaps,
               round(CAST(mn AS DOUBLE) / 1e6, {round_digits}) AS min_gap_s,
               round(CAST(mx AS DOUBLE) / 1e6, {round_digits}) AS max_gap_s,
               round(CAST(sm AS DOUBLE) / n_gaps) / 1e6 AS avg_gap_s
        FROM a
    """


def minhash_recall_sql(
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
    round_digits: int = 6,
) -> str:
    """Mirror of dedup.minhash_recall: exact-Jaccard pairs (uncapped)
    vs the LSH pipeline's found pairs, composed from the same two
    generators the individual oracles use."""
    exact = dedup_ngram_jaccard_sql(
        threshold=threshold, shingle_n=shingle_n, max_shingle_df=None
    )
    found = dedup_minhash_sql(
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        shingle_n=shingle_n,
    )
    return f"""
        WITH t AS (
          SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs
          FROM ({exact}) e
        ),
        f AS (
          SELECT CAST(count(*) AS BIGINT) AS n_found_pairs
          FROM ({exact}) e
          WHERE EXISTS (
            SELECT 1 FROM ({found}) a
            WHERE a.id_1 = e.id_1 AND a.id_2 = e.id_2
          )
        )
        SELECT n_exact_pairs, n_found_pairs,
               round(CAST(n_found_pairs AS DOUBLE)
                     / CAST(n_exact_pairs AS DOUBLE), {round_digits})
                 AS recall
        FROM t, f
    """


def corr_matrix_sql(
    table: str,
    cols: list[str],
    decimals: int = 2,
    round_digits: int = 6,
) -> str:
    """Mirror of profile.corr_matrix: HUGEINT-exact sums (DuckDB's
    128-bit twin of Spark's decimal(38,0)), same fixed double assembly."""
    scale = 10 ** decimals
    not_null = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    proj = ", ".join(
        f"CAST(round({c} * {scale}) AS HUGEINT) AS v{i}"
        for i, c in enumerate(cols)
    )
    sums = ["CAST(count(*) AS HUGEINT) AS n"]
    for i in range(len(cols)):
        sums.append(f"sum(v{i}) AS s{i}")
        sums.append(f"sum(v{i} * v{i}) AS ss{i}")
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            sums.append(f"sum(v{i} * v{j}) AS sp{i}_{j}")
    branches = []
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            b = cols[j]
            cov = f"(n * sp{i}_{j} - s{i} * s{j})"
            va = f"(n * ss{i} - s{i} * s{i})"
            vb = f"(n * ss{j} - s{j} * s{j})"
            branches.append(f"""
              SELECT '{a}' AS col_a, '{b}' AS col_b,
                     CAST(n AS BIGINT) AS n,
                     CASE WHEN {va} > 0 AND {vb} > 0 THEN
                       round(CAST({cov} AS DOUBLE)
                             / (sqrt(CAST({va} AS DOUBLE))
                                * sqrt(CAST({vb} AS DOUBLE))),
                             {round_digits})
                     END AS corr
              FROM g""")
    union = "\n              UNION ALL".join(branches)
    return f"""
        WITH b AS (
          SELECT {proj} FROM {table} WHERE {not_null}
        ),
        g AS (SELECT {", ".join(sums)} FROM b)
        {union}
    """


def mutual_information_sql(
    table: str, col_a: str, col_b: str, round_digits: int = 6
) -> str:
    """Mirror of drift.mutual_information: same joint/marginal counts,
    same double expression per term, rounding absorbs ln ulps."""
    return f"""
        WITH joint AS (
          SELECT coalesce(CAST({col_a} AS VARCHAR), '__NULL__') AS a,
                 coalesce(CAST({col_b} AS VARCHAR), '__NULL__') AS b,
                 count(*) AS c_ab
          FROM {table} GROUP BY 1, 2
        ),
        ma AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a
               FROM joint GROUP BY a),
        mb AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b
               FROM joint GROUP BY b),
        tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM joint),
        mi AS (
          SELECT CAST(max(n) AS BIGINT) AS n,
                 count(DISTINCT j.a) AS n_cats_a,
                 count(DISTINCT j.b) AS n_cats_b,
                 sum((CAST(c_ab AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(n * c_ab AS DOUBLE)
                          / CAST(c_a * c_b AS DOUBLE))) AS mi_raw
          FROM joint j
          JOIN ma ON ma.a = j.a
          JOIN mb ON mb.b = j.b, tot
        ),
        ha AS (
          SELECT sum(-(CAST(c_a AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(c_a AS DOUBLE) / CAST(n AS DOUBLE))) AS h
          FROM ma, tot
        ),
        hb AS (
          SELECT sum(-(CAST(c_b AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(c_b AS DOUBLE) / CAST(n AS DOUBLE))) AS h
          FROM mb, tot
        )
        SELECT n, n_cats_a, n_cats_b,
               round(mi_raw, {round_digits}) AS mi_nats,
               round(CASE WHEN sqrt(ha.h * hb.h) > 0
                          THEN mi_raw / sqrt(ha.h * hb.h) END,
                     {round_digits}) AS nmi
        FROM mi, ha, hb
    """


def bm25_topk_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Mirror of retrieval.bm25_topk: identical token model, exact
    integer corpus stats, the same left-to-right IEEE expression for the
    per-term score, and micro-unit INTEGER sums per (query, doc) so the
    cross-term addition order cannot drift between engines."""
    values = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries
    )
    return f"""
        {_DOC_BASE},
        tok AS (SELECT doc_id, unnest(__t__) AS token FROM toked),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        dfreq AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1),
        stats AS (
          SELECT count(*) AS n_corpus, CAST(sum(dl) AS BIGINT) AS sum_dl
          FROM dl
        ),
        q(query_id, qtext) AS (VALUES {values}),
        qt AS (
          SELECT query_id,
                 unnest(list_distinct({tokens("qtext")})) AS token
          FROM q
        ),
        qs AS (
          SELECT query_id, qt.token,
                 ln(1.0 + (n_corpus - df_t + 0.5) / (df_t + 0.5)) AS idf,
                 CAST(sum_dl AS DOUBLE) / n_corpus AS avgdl
          FROM qt JOIN dfreq USING (token) CROSS JOIN stats
        ),
        sc AS (
          SELECT query_id, doc_id,
                 CAST(round(
                   idf * (tf * ({k1} + 1.0))
                   / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
                   * 1000000
                 ) AS BIGINT) AS s_micro
          FROM tf JOIN dl USING (doc_id) JOIN qs USING (token)
        ),
        agg AS (
          SELECT query_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS s_micro
          FROM sc GROUP BY 1, 2
        ),
        rk AS (
          SELECT query_id, doc_id, s_micro,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY s_micro DESC, doc_id
                 ) AS INTEGER) AS rank
          FROM agg
        )
        SELECT query_id, doc_id,
               CAST(s_micro AS DOUBLE) / 1000000 AS score, rank
        FROM rk WHERE rank <= {k}
    """


def curriculum_sample_sql(
    n_bands: int = 4,
    order_col: str = "n_chars",
    partition_col: str = "source",
    id_col: str = "doc_id",
    table: str = "documents",
    salt: str = "curriculum",
) -> str:
    """Mirror of curation.curriculum_sample: same ntile total order
    (order desc, id asc — SQL-standard bucket rule on both engines),
    same linear keep-rate, same 32-bit md5 fraction draw."""
    u = (
        f"(('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        "::BIGINT / 4294967296.0)"
    )
    return f"""
        WITH banded AS (
          SELECT {id_col}, {partition_col}, {order_col},
                 CAST(ntile({n_bands}) OVER (
                   PARTITION BY {partition_col}
                   ORDER BY {order_col} DESC, {id_col}
                 ) AS INTEGER) AS band
          FROM {table}
        )
        SELECT {id_col}, {partition_col}, {order_col}, band,
               round(CAST({n_bands} + 1 - band AS DOUBLE) / {n_bands}, 6)
                 AS keep_rate
        FROM banded
        WHERE {u} < CAST({n_bands} + 1 - band AS DOUBLE) / {n_bands}
    """


def split_leakage_sql(
    fractions: dict[str, float] | None = None,
    holdout_split: str = "val",
    train_split: str = "train",
    shingle_n: int = 5,
    max_shingle_df: int | None = 1000,
    salt: str = "split",
) -> str:
    """Mirror of curation.split_leakage: same shingle model, the exact
    hash_split CASE thresholds, the same train-side viral-shingle cap,
    and distinct-counting aggregation per holdout doc."""
    from topnotch_spark.operators.curation import _rate_threshold_hex

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(fractions)
    cum = 0.0
    cases = []
    key = f"substr(md5('{salt}:' || CAST(id AS VARCHAR)), 1, 8)"
    for name, frac in list(fractions.items())[:-1]:
        cum += frac
        thr = _rate_threshold_hex(min(cum, 1.0))
        cases.append(f"WHEN {key} < '{thr}' THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    cap = (
        f"""
        capped AS (
          SELECT sh FROM train GROUP BY sh HAVING count(*) <= {max_shingle_df}
        ),
        train_j AS (SELECT t.train_id, t.sh FROM train t JOIN capped USING (sh)),
        """
        if max_shingle_df is not None
        else "train_j AS (SELECT train_id, sh FROM train),"
    )
    return f"""
        {_DOC_BASE},
        shingled AS (
          SELECT doc_id AS id, {shingles(n=shingle_n)} AS __sh__ FROM toked
        ),
        arr AS (
          SELECT id, __sh__, {case} AS split
          FROM shingled WHERE len(__sh__) > 0
        ),
        train AS (
          SELECT id AS train_id, unnest(__sh__) AS sh FROM arr
          WHERE split = '{train_split}'
        ),
        {cap}
        hold AS (
          SELECT id, len(__sh__) AS n_sh, unnest(__sh__) AS sh FROM arr
          WHERE split = '{holdout_split}'
        )
        SELECT h.id AS doc_id,
               CAST(count(DISTINCT h.sh) AS BIGINT) AS n_common,
               CAST(count(DISTINCT t.train_id) AS BIGINT) AS n_train_partners,
               round(count(DISTINCT h.sh) / CAST(h.n_sh AS DOUBLE), 6)
                 AS leak_frac
        FROM hold h JOIN train_j t USING (sh)
        GROUP BY h.id, h.n_sh
    """


def psi_trend_sql(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    period: str = "week",
    n_buckets: int = 10,
    eps: float = 1e-6,
    round_digits: int = 6,
) -> str:
    """Mirror of drift.psi_trend: same global equal-width bins, same
    eps-for-empty convention, per-bin terms rounded to micro-unit
    INTEGERS before the per-period sum (order-independent)."""
    nb = n_buckets
    return f"""
        WITH base AS (
          SELECT date_trunc('{period}', CAST({ts_col} AS TIMESTAMP)) AS period,
                 CAST({value_col} AS DOUBLE) AS x
          FROM {table}
          WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
        ),
        bnd AS (SELECT min(x) AS mn, (max(x) - min(x)) / {nb} AS w FROM base),
        counts AS (
          SELECT period,
                 least(greatest(CAST(floor((x - mn) / w) AS INTEGER), 0),
                       {nb - 1}) AS bucket,
                 count(*) AS n
          FROM base, bnd GROUP BY 1, 2
        ),
        refp AS (SELECT min(period) AS rp FROM counts),
        ref AS (
          SELECT bucket, CAST(n AS BIGINT) AS n_ref
          FROM counts, refp WHERE period = rp
        ),
        reft AS (SELECT CAST(sum(n_ref) AS BIGINT) AS total_ref FROM ref),
        spine AS (
          SELECT period, unnest(generate_series(0, {nb - 1})) AS bucket
          FROM (SELECT DISTINCT period FROM counts)
        ),
        grid AS (
          SELECT s.period, s.bucket,
                 coalesce(c.n, 0) AS n_cur,
                 coalesce(r.n_ref, 0) AS n_ref,
                 t.total_ref
          FROM spine s
          LEFT JOIN counts c ON s.period = c.period AND s.bucket = c.bucket
          LEFT JOIN ref r ON s.bucket = r.bucket
          CROSS JOIN reft t
        ),
        terms AS (
          SELECT period, n_cur,
                 CAST(round(
                   (CASE WHEN n_cur / CAST(sum(n_cur) OVER (PARTITION BY period) AS DOUBLE) = 0
                         THEN {eps}
                         ELSE n_cur / CAST(sum(n_cur) OVER (PARTITION BY period) AS DOUBLE) END
                    - CASE WHEN n_ref / CAST(total_ref AS DOUBLE) = 0
                           THEN {eps}
                           ELSE n_ref / CAST(total_ref AS DOUBLE) END)
                   * ln(
                     CASE WHEN n_cur / CAST(sum(n_cur) OVER (PARTITION BY period) AS DOUBLE) = 0
                          THEN {eps}
                          ELSE n_cur / CAST(sum(n_cur) OVER (PARTITION BY period) AS DOUBLE) END
                     / CASE WHEN n_ref / CAST(total_ref AS DOUBLE) = 0
                            THEN {eps}
                            ELSE n_ref / CAST(total_ref AS DOUBLE) END)
                   * 1000000
                 ) AS BIGINT) AS t_micro
          FROM grid
        )
        SELECT CAST(period AS TIMESTAMP) AS period,
               CAST(sum(n_cur) AS BIGINT) AS n_rows,
               round(CAST(sum(t_micro) AS BIGINT) / 1000000.0, {round_digits})
                 AS psi
        FROM terms GROUP BY period
    """


def quality_rank_calibrate_sql(
    order_col: str = "n_chars",
    partition_col: str = "source",
    id_col: str = "doc_id",
    table: str = "documents",
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.quality_rank_calibrate: percent_rank over the
    identical (order asc, id asc) total order."""
    return f"""
        SELECT {id_col}, {partition_col}, {order_col},
               round(percent_rank() OVER (
                 PARTITION BY {partition_col}
                 ORDER BY {order_col}, {id_col}
               ), {round_digits}) AS q_calibrated
        FROM {table}
    """


def vocab_oov_rate_sql(
    group_col: str = "source",
    vocab_k: int = 1000,
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.vocab_oov_rate: the same deterministic top-k
    vocabulary (count desc, token asc) and per-group OOV accounting."""
    return f"""
        WITH toked AS (
          SELECT {group_col}, {tokens()} AS __t__ FROM documents
        ),
        tok AS (
          SELECT {group_col} AS grp, unnest(__t__) AS token FROM toked
        ),
        vocab AS (
          SELECT token FROM tok GROUP BY token
          ORDER BY count(*) DESC, token LIMIT {vocab_k}
        )
        SELECT t.grp AS {group_col},
               count(*) AS n_tokens,
               CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), {round_digits}) AS oov_rate
        FROM tok t LEFT JOIN vocab v USING (token)
        GROUP BY t.grp
    """


# ---- graph analytics (operators/graph.py) ---------------------------------

def _copurchase_edges_cte(
    max_basket: int = 12, min_support: int = 1
) -> str:
    """Shared undirected co-purchase edge CTEs over lineitem: distinct
    (order, part), baskets above ``max_basket`` dropped, unordered pairs
    with >= ``min_support`` co-occurrences. MATERIALIZED so the chained
    PageRank iterations don't re-evaluate the basket join per round."""
    sup = (
        f" HAVING count(*) >= {min_support}" if min_support > 1 else ""
    )
    return f"""
        items AS (
          SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
          WHERE l_partkey IS NOT NULL
        ),
        kept AS (
          SELECT items.* FROM items
          JOIN (
            SELECT b FROM items GROUP BY b HAVING count(*) <= {max_basket}
          ) ok USING (b)
        ),
        uedges AS MATERIALIZED (
          SELECT a.i AS src, c.i AS dst, count(*) AS w
          FROM kept a JOIN kept c USING (b)
          WHERE a.i < c.i
          GROUP BY a.i, c.i{sup}
        )
    """


def pagerank_parts_sql(
    iters: int = 8,
    scale: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
    max_basket: int = 12,
    min_support: int = 1,
) -> str:
    """Mirror of graph.pagerank over graph.cooccurrence_edges(lineitem):
    the same fixed-point integer recurrence unrolled as ``iters`` chained
    CTEs — teleport and shares use integer `//` exactly like Spark's
    `div`, so every rank is bit-identical."""
    tp = f"(CAST({scale} AS BIGINT) * {damp_den - damp_num} // {damp_den}) // nn.n"
    rounds = []
    for k in range(1, iters + 1):
        rounds.append(f"""
        r{k} AS (
          SELECT d.src AS node,
                 CAST({tp} + COALESCE(s.contrib, 0) AS BIGINT) AS rank
          FROM deg d CROSS JOIN nn
          LEFT JOIN (
            SELECT e.dst AS node,
                   SUM((r.rank * {damp_num} // {damp_den}) // dd.outdeg) AS contrib
            FROM edges e
            JOIN r{k - 1} r ON e.src = r.node
            JOIN deg dd ON dd.src = e.src
            GROUP BY e.dst
          ) s ON s.node = d.src
        )""")
    chain = ",".join(rounds)
    return f"""
        WITH {_copurchase_edges_cte(max_basket, min_support)},
        edges AS MATERIALIZED (
          SELECT src, dst FROM uedges
          UNION ALL
          SELECT dst, src FROM uedges
        ),
        deg AS MATERIALIZED (
          SELECT src, count(*) AS outdeg FROM edges GROUP BY src
        ),
        nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
        r0 AS (
          SELECT src AS node, CAST(CAST({scale} AS BIGINT) // n AS BIGINT) AS rank
          FROM deg CROSS JOIN nn
        ),{chain}
        SELECT r.node AS part_id,
               d.outdeg AS out_degree,
               r.rank AS rank_scaled
        FROM r{iters} r JOIN deg d ON d.src = r.node
    """


def label_propagation_parts_sql(
    iters: int = 4,
    max_basket: int = 12,
    min_support: int = 1,
) -> str:
    """Mirror of graph.label_propagation over
    graph.cooccurrence_edges(lineitem): the same synchronous weighted
    rounds unrolled as chained CTEs — per round, each node adopts the
    neighbor label with the greatest total pair_count weight, ties to
    the smallest label (integer weights, total order: bit-identical)."""
    rounds = []
    for k in range(1, iters + 1):
        rounds.append(f"""
        l{k} AS (
          SELECT node, community FROM (
            SELECT s.src AS node, l.community,
                   row_number() OVER (
                     PARTITION BY s.src
                     ORDER BY sum(s.w) DESC, l.community ASC) AS rn
            FROM sym s JOIN l{k - 1} l ON l.node = s.dst
            GROUP BY s.src, l.community
          ) WHERE rn = 1
        )""")
    chain = ",".join(rounds)
    return f"""
        WITH {_copurchase_edges_cte(max_basket, min_support)},
        sym AS MATERIALIZED (
          SELECT src, dst, CAST(w AS BIGINT) AS w FROM uedges
          UNION ALL
          SELECT dst, src, CAST(w AS BIGINT) AS w FROM uedges
        ),
        l0 AS (
          SELECT DISTINCT src AS node, src AS community FROM sym
        ),{chain}
        SELECT l.node AS part_id, l.community, s.community_size
        FROM l{iters} l
        JOIN (
          SELECT community, CAST(count(*) AS BIGINT) AS community_size
          FROM l{iters} GROUP BY community
        ) s USING (community)
    """


def k_core_parts_sql(
    k: int = 4,
    max_rounds: int = 8,
    max_basket: int = 12,
    min_support: int = 1,
) -> str:
    """Mirror of graph.k_core over the co-purchase graph: synchronous
    peeling unrolled as max_rounds MATERIALIZED CTEs (peeling is
    monotone, so extra rounds beyond Spark's early exit are no-ops and
    the results still match bit-for-bit)."""
    rounds = []
    for r in range(1, max_rounds + 1):
        rounds.append(f"""
        a{r} AS MATERIALIZED (
          SELECT src FROM (
            SELECT e.src, count(*) AS d
            FROM sym e
            JOIN a{r - 1} x ON e.src = x.src
            JOIN a{r - 1} y ON e.dst = y.src
            GROUP BY e.src
          ) WHERE d >= {k}
        )""")
    chain = ",".join(rounds)
    return f"""
        WITH {_copurchase_edges_cte(max_basket, min_support)},
        sym AS MATERIALIZED (
          SELECT src, dst FROM uedges
          UNION ALL
          SELECT dst, src FROM uedges
        ),
        full_deg AS MATERIALIZED (
          SELECT src, CAST(count(*) AS BIGINT) AS degree
          FROM sym GROUP BY src
        ),
        a0 AS (SELECT src FROM full_deg),{chain},
        surv AS (
          SELECT e.src, CAST(count(*) AS BIGINT) AS core_degree
          FROM sym e
          JOIN a{max_rounds} x ON e.src = x.src
          JOIN a{max_rounds} y ON e.dst = y.src
          GROUP BY e.src
        )
        SELECT d.src AS part_id, d.degree,
               s.core_degree IS NOT NULL AS in_kcore,
               s.core_degree
        FROM full_deg d LEFT JOIN surv s USING (src)
    """


def triangle_parts_sql(
    min_support: int = 2, max_basket: int = 12, round_digits: int = 6
) -> str:
    """Mirror of graph.triangle_counts over the min-support co-purchase
    graph: ordered wedges (a<b<c) closed by the (a,c) edge; per-node
    credit via the three-corner union; coefficient = exact integers
    divided then rounded."""
    return f"""
        WITH {_copurchase_edges_cte(max_basket, min_support)},
        deg AS (
          SELECT node, count(*) AS degree FROM (
            SELECT src AS node FROM uedges
            UNION ALL
            SELECT dst FROM uedges
          ) GROUP BY node
        ),
        tris AS (
          SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
          FROM uedges e1
          JOIN uedges e2 ON e1.dst = e2.src
          JOIN uedges e3 ON e3.src = e1.src AND e3.dst = e2.dst
        ),
        corners AS (
          SELECT node, count(*) AS tri_count FROM (
            SELECT a AS node FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris
          ) GROUP BY node
        )
        SELECT d.node AS part_id,
               d.degree,
               CAST(COALESCE(c.tri_count, 0) AS BIGINT) AS tri_count,
               CASE WHEN d.degree >= 2 THEN
                 round(2.0 * COALESCE(c.tri_count, 0)
                       / (d.degree * (d.degree - 1)), {round_digits})
               ELSE 0.0 END AS clustering_coeff
        FROM deg d LEFT JOIN corners c ON c.node = d.node
    """


def linear_classifier_sql(
    weights: dict[str, int], bias_milli: int = 0
) -> str:
    """Mirror of textqc.linear_classifier_score: the same integer
    milli-weight VALUES table, explode + join + sum, bias applied after
    the left join-back so no-vocabulary docs score exactly `bias`.
    Tokens are SQL-escaped (quote doubling) so an apostrophe-bearing
    vocabulary cannot break or inject into the generated VALUES list."""
    vals = ", ".join(
        "('{}', {})".format(t.replace("'", "''"), int(m))
        for t, m in sorted(weights.items())
    )
    return f"""
        WITH w AS (SELECT * FROM (VALUES {vals}) AS t(token, w_milli)),
        toked AS (
          SELECT doc_id, {tokens()} AS __t__ FROM documents
        ),
        per_doc AS (
          SELECT doc_id, CAST(len(__t__) AS INTEGER) AS n_tokens FROM toked
        ),
        tok AS (
          SELECT doc_id, unnest(__t__) AS token FROM toked
        ),
        scored AS (
          SELECT doc_id, CAST(SUM(w.w_milli) AS BIGINT) AS dot
          FROM tok JOIN w USING (token) GROUP BY doc_id
        )
        SELECT p.doc_id,
               p.n_tokens,
               COALESCE(s.dot, 0) + {bias_milli} AS logit_milli,
               COALESCE(s.dot, 0) + {bias_milli} > 0 AS keep
        FROM per_doc p LEFT JOIN scored s USING (doc_id)
    """


def ppr_related_parts_sql(
    iters: int = 8,
    k_seeds: int = 5,
    scale: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
    max_basket: int = 12,
    min_support: int = 2,
) -> str:
    """Mirror of graph.personalized_pagerank over the weighted
    min-support co-purchase graph: teleport only to the top-k seed
    parts (distinct-basket count desc, part asc), per-edge weighted
    shares ``((rank*dn//dd) * w) // wout`` — the same chained integer
    CTE scheme as pagerank_parts_sql."""
    base = f"(CAST({scale} AS BIGINT) * {damp_den - damp_num} // {damp_den})"
    rounds = []
    for k in range(1, iters + 1):
        rounds.append(f"""
        r{k} AS (
          SELECT n.node,
                 CAST(CASE WHEN s2.node IS NOT NULL
                           THEN {base} // ns.ns ELSE 0 END
                      + COALESCE(c.contrib, 0) AS BIGINT) AS rank
          FROM nodes n CROSS JOIN nseeds ns
          LEFT JOIN seeds s2 ON s2.node = n.node
          LEFT JOIN (
            SELECT e.dst AS node,
                   SUM(((r.rank * {damp_num} // {damp_den}) * e.w)
                       // d.wout) AS contrib
            FROM edges e
            JOIN r{k - 1} r ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) c ON c.node = n.node
        )""")
    chain = ",".join(rounds)
    return f"""
        WITH {_copurchase_edges_cte(max_basket, min_support)},
        edges AS MATERIALIZED (
          SELECT src, dst, w FROM uedges
          UNION ALL
          SELECT dst, src, w FROM uedges
        ),
        deg AS MATERIALIZED (
          SELECT src, count(*) AS outdeg, CAST(SUM(w) AS BIGINT) AS wout
          FROM edges GROUP BY src
        ),
        nodes AS (SELECT src AS node FROM deg),
        seeds_raw AS (
          SELECT i AS node FROM items GROUP BY i
          ORDER BY count(*) DESC, i LIMIT {k_seeds}
        ),
        seeds AS MATERIALIZED (
          SELECT s.node FROM seeds_raw s JOIN deg d ON d.src = s.node
        ),
        nseeds AS MATERIALIZED (SELECT count(*) AS ns FROM seeds),
        r0 AS (
          SELECT n.node,
                 CAST(CASE WHEN s2.node IS NOT NULL
                           THEN CAST({scale} AS BIGINT) // ns.ns
                           ELSE 0 END AS BIGINT) AS rank
          FROM nodes n CROSS JOIN nseeds ns
          LEFT JOIN seeds s2 ON s2.node = n.node
        ),{chain}
        SELECT r.node AS part_id,
               d.outdeg AS out_degree,
               r.rank AS rank_scaled
        FROM r{iters} r JOIN deg d ON d.src = r.node
    """


def streaming_distinct_users_sql(window: str = "1 hour") -> str:
    """Batch equivalent of the deterministic-HLL streaming distinct
    sketch (streaming/ops.hll_register_stream +
    windowed_distinct_estimate): same md5 registers, same per-window
    MAX rho, same exact-integer harmonic estimate — MAX is batch/order
    insensitive, so the drained stream equals this GROUP BY."""
    bucket = f"time_bucket(INTERVAL {window}, CAST(ts AS TIMESTAMP))"
    v = " + ".join(
        f"{nibble('h', str(3 + i))} * {16 ** (7 - i)}" for i in range(8)
    )
    reg = f"{nibble('h', '1')} * 16 + {nibble('h', '2')}"
    num = 7182 * 256 * 256 * (2**33)
    from topnotch_spark.streaming.ops import hll_linear_counting_table

    lc_list = "[" + ", ".join(str(v) for v in hll_linear_counting_table()) + "]"
    return f"""
        WITH ev AS (
          SELECT {bucket} AS window_start,
                 md5(CAST(user_id AS VARCHAR)) AS h
          FROM events
        ),
        vals AS (
          SELECT window_start, {reg} AS reg, CAST({v} AS BIGINT) AS v
          FROM ev
        ),
        regs AS (
          SELECT window_start, reg,
                 MAX(CASE WHEN v = 0 THEN 33
                          ELSE 33 - length(bin(v)) END) AS max_rho
          FROM vals GROUP BY 1, 2
        ),
        rolled AS (
          SELECT window_start,
                 count(*) AS n_regs,
                 CAST({num} AS BIGINT) //
                   (10000 * (CAST(SUM(CAST(1 AS BIGINT)
                                       << (33 - max_rho)) AS BIGINT)
                             + (256 - count(*)) * CAST({2**33} AS BIGINT)))
                 AS raw_est
          FROM regs
          GROUP BY window_start
        )
        SELECT window_start,
               n_regs,
               CASE WHEN n_regs < 256 AND raw_est <= 640
                    THEN CAST({lc_list}[256 - n_regs] AS BIGINT)
                    ELSE raw_est END AS est_distinct
        FROM rolled
    """


def _unigram_prefix_ctes(
    max_word_len: int,
    max_piece_len: int,
    seed_size: int,
    vocab_size: int,
    n_rounds: int,
    toked_extra: str = "",
) -> str:
    """CTE body (for a WITH RECURSIVE clause) replaying the unigram-LM
    EM trainer through ``lp{n_rounds}`` — shared by the vocab and
    fertility mirrors. The E-step's Viterbi DP is replayed by
    ENUMERATING every segmentation with a recursive CTE (words are
    ≤ max_word_len chars, so paths are bounded) and picking, per word,
    the max-lp-sum path with ties broken by lexicographically smallest
    reversed interior boundary list — provably the same segmentation
    the Spark DP's (max cost, min predecessor) reconstruction selects.
    Fixed-point milli-nat log-probs (round(1000·ln x) as BIGINT) keep
    both engines bit-identical; every sum() is cast back to BIGINT
    (DuckDB sums BIGINT into HUGEINT — the round-2 strict-hash
    lesson). ``toked_extra`` adds columns to the toked CTE (e.g. a
    group column for the fertility rollup)."""
    W, P = int(max_word_len), int(max_piece_len)
    ilog = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000) AS BIGINT)"

    def lp_cte(n: int, vocab: str) -> str:
        return f"""
        lp{n} AS MATERIALIZED (
          SELECT piece, freq,
                 {ilog.format(x="greatest(freq, CAST(1 AS BIGINT))")}
                 - {ilog.format(x="t.__T__")} AS lp_milli
          FROM {vocab},
               (SELECT CAST(sum(greatest(freq, CAST(1 AS BIGINT)))
                            AS BIGINT) AS __T__ FROM {vocab}) t
        )"""

    rounds = []
    for r in range(1, n_rounds + 1):
        rounds.append(f"""
        p{r} AS (
          SELECT word, wc, CAST(0 AS BIGINT) AS cost, 0 AS pos,
                 [0] AS bounds
          FROM words
          UNION ALL
          SELECT p.word, p.wc, p.cost + v.lp_milli,
                 p.pos + length(v.piece),
                 list_append(p.bounds, p.pos + length(v.piece))
          FROM p{r} p JOIN lp{r - 1} v
            ON length(v.piece) <= length(p.word) - p.pos
           AND substr(p.word, p.pos + 1, length(v.piece)) = v.piece
        ),
        best{r} AS (
          SELECT word, wc, bounds FROM (
            SELECT word, wc, bounds,
                   row_number() OVER (
                     PARTITION BY word
                     ORDER BY cost DESC,
                              list_reverse(bounds[2:len(bounds) - 1]) ASC
                   ) AS rn
            FROM p{r} WHERE pos = length(word)
          ) WHERE rn = 1
        ),
        usage{r} AS (
          SELECT piece, CAST(sum(wc) AS BIGINT) AS freq
          FROM (
            SELECT substr(word, bounds[k] + 1,
                          bounds[k + 1] - bounds[k]) AS piece, wc
            FROM best{r}, range(1, {W} + 1) t(k)
            WHERE k <= len(bounds) - 1
          ) GROUP BY piece
        ),
        v{r} AS (
          SELECT piece, freq FROM (
            SELECT piece, freq FROM usage{r} WHERE length(piece) >= 2
            ORDER BY freq DESC, piece ASC LIMIT {vocab_size}
          )
          UNION ALL
          SELECT c.piece, coalesce(u.freq, CAST(0 AS BIGINT)) AS freq
          FROM (SELECT piece FROM subs WHERE length(piece) = 1) c
          LEFT JOIN usage{r} u USING (piece)
        ),
        {lp_cte(r, f"v{r}")}""")

    return f"""
        toked AS (
          SELECT doc_id, text{toked_extra}, {tokens()} AS __t__
          FROM documents
        ),
        words AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          WHERE length(word) <= {W}
          GROUP BY word
        ),
        subs AS MATERIALIZED (
          SELECT piece, CAST(sum(wc) AS BIGINT) AS freq
          FROM (
            SELECT substr(word, i, l) AS piece, wc
            FROM words
            CROSS JOIN range(1, {P} + 1) tl(l)
            CROSS JOIN range(1, {W} + 1) ti(i)
            WHERE i + l - 1 <= length(word)
          ) GROUP BY piece
        ),
        v0 AS (
          SELECT piece, freq FROM (
            SELECT piece, freq FROM subs WHERE length(piece) >= 2
            ORDER BY freq DESC, piece ASC LIMIT {seed_size}
          )
          UNION ALL
          SELECT piece, freq FROM subs WHERE length(piece) = 1
        ),
        {lp_cte(0, "v0")},
        {",".join(rounds)}
    """


def unigram_lm_vocab_sql(
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_size: int = 64,
    vocab_size: int = 48,
    n_rounds: int = 2,
) -> str:
    """Mirror of textqc.unigram_lm_vocab (Kudo 2018 EM trainer): the
    shared EM prefix (see _unigram_prefix_ctes) plus the final
    (rank, piece, freq, lp_milli) ranking."""
    prefix = _unigram_prefix_ctes(
        max_word_len, max_piece_len, seed_size, vocab_size, n_rounds
    )
    return f"""
        WITH RECURSIVE {prefix}
        SELECT CAST(row_number() OVER (ORDER BY freq DESC, piece ASC)
                    AS INTEGER) AS rank,
               piece, freq, lp_milli
        FROM lp{n_rounds}
        ORDER BY rank
    """


def unigram_fertility_sql(
    group_col: str = "source",
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_size: int = 64,
    vocab_size: int = 48,
    n_rounds: int = 2,
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.unigram_fertility_by_group: the shared EM
    prefix, one more all-segmentations Viterbi pass under the FINAL
    piece probs for the per-word subword count, then the per-group
    fertility rollup (tokens longer than max_word_len drop from the
    join on both sides)."""
    prefix = _unigram_prefix_ctes(
        max_word_len, max_piece_len, seed_size, vocab_size, n_rounds,
        toked_extra=f", {group_col}",
    )
    n = n_rounds
    return f"""
        WITH RECURSIVE {prefix},
        pf AS (
          SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS pos,
                 [0] AS bounds
          FROM words
          UNION ALL
          SELECT p.word, p.cost + v.lp_milli,
                 p.pos + length(v.piece),
                 list_append(p.bounds, p.pos + length(v.piece))
          FROM pf p JOIN lp{n} v
            ON length(v.piece) <= length(p.word) - p.pos
           AND substr(p.word, p.pos + 1, length(v.piece)) = v.piece
        ),
        bestf AS (
          SELECT word, bounds FROM (
            SELECT word, bounds,
                   row_number() OVER (
                     PARTITION BY word
                     ORDER BY cost DESC,
                              list_reverse(bounds[2:len(bounds) - 1]) ASC
                   ) AS rn
            FROM pf WHERE pos = length(word)
          ) WHERE rn = 1
        ),
        wordsub AS (
          SELECT word, CAST(len(bounds) - 1 AS BIGINT) AS nsub,
                 CAST(length(word) AS BIGINT) AS nchr
          FROM bestf
        ),
        tok AS (
          SELECT {group_col} AS grp, unnest(__t__) AS word FROM toked
        )
        SELECT grp AS {group_col},
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(nsub) AS BIGINT) AS n_subwords,
               round(CAST(sum(nsub) AS DOUBLE) / count(*),
                     {round_digits}) AS fertility,
               round(CAST(sum(nchr) AS DOUBLE) / sum(nsub),
                     {round_digits}) AS chars_per_subword
        FROM tok JOIN wordsub USING (word)
        GROUP BY grp
    """


def langid_accuracy_sql(
    lang_markers: dict[str, list[str]],
    true_col: str = "lang",
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.langid_accuracy: the text_langid predictor
    joined against the trusted label, confusion cells exploded into
    true-role/pred-role rows, per-language precision/recall/f1. Counts
    stay BIGINT via count(*)/FILTER (the round-2 HUGEINT lesson)."""
    scores = {lang: _stopword_ratio(m) for lang, m in lang_markers.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    pred = "CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'"
    for lang in lang_markers:
        pred += f" WHEN {scores[lang]} = {best} THEN '{lang}'"
    pred += " END"
    return f"""
        WITH toked AS (
          SELECT doc_id, text, {true_col}, {tokens()} AS __t__
          FROM documents
        ),
        cells AS (
          SELECT {true_col} AS t, {pred} AS p, CAST(count(*) AS BIGINT) AS n
          FROM toked GROUP BY 1, 2
        ),
        roles AS (
          SELECT t AS lang, n AS n_true, CAST(0 AS BIGINT) AS n_pred,
                 CASE WHEN t = p THEN n ELSE CAST(0 AS BIGINT) END
                   AS n_correct
          FROM cells
          UNION ALL
          SELECT p AS lang, CAST(0 AS BIGINT), n, CAST(0 AS BIGINT)
          FROM cells
        ),
        agg AS (
          SELECT lang,
                 CAST(sum(n_true) AS BIGINT) AS n_true,
                 CAST(sum(n_pred) AS BIGINT) AS n_pred,
                 CAST(sum(n_correct) AS BIGINT) AS n_correct
          FROM roles GROUP BY lang
        )
        SELECT lang, n_true, n_pred, n_correct,
               round(prec, {round_digits}) AS precision,
               round(rec, {round_digits}) AS recall,
               round(CASE WHEN prec IS NOT NULL AND rec IS NOT NULL
                          AND prec + rec > 0
                          THEN 2.0 * prec * rec / (prec + rec) END,
                     {round_digits}) AS f1
        FROM (
          SELECT *,
                 CASE WHEN n_pred > 0
                      THEN n_correct * 1.0 / n_pred END AS prec,
                 CASE WHEN n_true > 0
                      THEN n_correct * 1.0 / n_true END AS rec
          FROM agg
        )
        ORDER BY lang
    """


def mixture_allocate_sql(
    group_col: str,
    targets_milli: dict[str, int],
    budget_tokens: int,
    max_repeat_milli: int = 1000,
    round_digits: int = 6,
) -> str:
    """Mirror of curation.mixture_allocate: same ratio ordering (double
    division is IEEE-exact in both engines, ordering only), same
    BIGINT cross-product saturation test, same floor allocations.
    Window sums cast back to BIGINT (the HUGEINT lesson)."""
    B = int(budget_tokens)
    mrm = int(max_repeat_milli)
    tgt_rows = ", ".join(
        "('{}', {})".format(str(s).replace("'", "''"), int(m))
        for s, m in sorted(targets_milli.items())
    )
    order = (
        "CASE WHEN t > 0 THEN CAST(cap AS DOUBLE) / t "
        "ELSE CAST('inf' AS DOUBLE) END, g"
    )
    return f"""
        WITH toked AS (
          SELECT {group_col} AS g, {tokens()} AS __t__ FROM documents
        ),
        per AS (
          SELECT g, CAST(sum(len(__t__)) AS BIGINT) AS avail
          FROM toked GROUP BY g
        ),
        tgt(tg, tm) AS (VALUES {tgt_rows}),
        base AS (
          SELECT per.g, avail,
                 CAST(coalesce(tm, 0) AS BIGINT) AS t,
                 avail * {mrm} // 1000 AS cap
          FROM per LEFT JOIN tgt ON per.g = tgt.tg
        ),
        staged AS (
          SELECT *,
            CAST(coalesce(sum(cap) OVER (
              ORDER BY {order}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cpre,
            CAST(sum(t) OVER (
              ORDER BY {order}
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS tsuf
          FROM base
        ),
        flags AS (
          SELECT *,
                 (t > 0 AND cap * tsuf <= greatest({B} - cpre, 0) * t)
                   AS capped
          FROM staged
        ),
        pools AS (
          SELECT CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0)
                      AS BIGINT) AS csat,
                 CAST(coalesce(sum(CASE WHEN NOT capped THEN t END), 0)
                      AS BIGINT) AS tfree
          FROM flags
        ),
        alloc AS (
          SELECT f.*,
                 CASE WHEN capped THEN cap
                      WHEN tfree > 0
                        THEN greatest({B} - csat, 0) * t // tfree
                      ELSE 0 END AS alloc_tokens
          FROM flags f, pools
        ),
        tot AS (
          SELECT CAST(sum(alloc_tokens) AS BIGINT) AS tt FROM alloc
        )
        SELECT g AS {group_col},
               avail AS tokens_available,
               t AS target_milli,
               cap AS cap_tokens,
               alloc_tokens,
               CASE WHEN avail > 0
                    THEN round(alloc_tokens * 1.0 / avail, {round_digits})
               END AS epochs,
               capped,
               CASE WHEN tt > 0 THEN alloc_tokens * 1000 // tt
                    ELSE CAST(0 AS BIGINT) END AS realized_milli
        FROM alloc, tot
        ORDER BY {group_col}
    """


def cross_perplexity_sql(
    ref_filter_sql: str,
    k: float = 1.0,
    round_digits: int = 4,
) -> str:
    """Mirror of textqc.cross_perplexity over documents:
    ``ref_filter_sql`` selects the reference slice (e.g.
    ``lang = 'en'``); add-k unigram LM with one shared unseen type,
    per-doc mean of −ln P (IEEE doubles, round like
    unigram_logprob)."""
    kf = repr(float(k))
    return f"""
        WITH toked AS (
          SELECT doc_id, text, {tokens()} AS __t__,
                 ({ref_filter_sql}) AS __is_ref__
          FROM documents
        ),
        vocab AS (
          SELECT token, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest(__t__) AS token FROM toked WHERE __is_ref__)
          GROUP BY token
        ),
        tot AS (
          SELECT CAST(sum(c) AS BIGINT) AS t_ref,
                 CAST(count(*) AS BIGINT) AS v_ref
          FROM vocab
        ),
        tok AS (SELECT doc_id, unnest(__t__) AS token FROM toked),
        scored AS (
          SELECT doc_id,
                 CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov,
                 -ln((coalesce(c, 0) + {kf})
                     / (t_ref + {kf} * (v_ref + 1))) AS nlp
          FROM tok LEFT JOIN vocab v USING (token), tot
        ),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 round(avg(nlp), {round_digits}) AS avg_neg_logprob
          FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(per.n_tokens, 0) AS n_tokens,
               coalesce(per.n_oov, 0) AS n_oov,
               CASE WHEN per.n_tokens > 0
                    THEN round(per.n_oov * 1.0 / per.n_tokens, 6)
               END AS oov_rate,
               per.avg_neg_logprob
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


def quantize_recall_sql(
    dim: int = 64, k: int = 10, n_queries: int = 5, round_digits: int = 6
) -> str:
    """Mirror of similarity.quantize_recall: exact top-k on the raw
    doubles vs exact top-k on the int8 quantize-dequantize round-trip
    (same floor(x+0.5) scheme as embedding_quantize_sql), per-query
    overlap and recall."""

    def topk(src: str, out: str) -> str:
        return f"""
        {out} AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round({cosine('q.dv', 'c.dv', dim)},
                                    {round_digits}) DESC,
                              c.vec_id ASC) AS rn
            FROM {src} c
            CROSS JOIN (SELECT * FROM {src}
                        WHERE vec_id < {n_queries}) q
            WHERE c.vec_id <> q.vec_id
          ) WHERE rn <= {k}
        )"""

    return f"""
        WITH raw AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
          FROM embeddings
        ),
        deq AS MATERIALIZED (
          SELECT vec_id,
                 CASE WHEN scale > 0 THEN
                   list_transform(dv, x ->
                     least(greatest(floor(x / scale + 0.5), -127), 127)
                     * scale)
                 ELSE list_transform(dv, x -> 0.0) END AS dv
          FROM (
            SELECT vec_id, dv,
                   list_max(list_transform(dv, x -> abs(x))) / 127.0
                     AS scale
            FROM raw
          )
        ),
        {topk('raw', 'exact_t')},
        {topk('deq', 'quant_t')}
        SELECT e.query_id,
               CAST(count(*) AS BIGINT) AS k_exact,
               CAST(count(q.neighbor_id) AS BIGINT) AS n_overlap,
               round(count(q.neighbor_id) * 1.0 / count(*),
                     {round_digits}) AS recall
        FROM exact_t e
        LEFT JOIN quant_t q
          ON e.query_id = q.query_id AND e.neighbor_id = q.neighbor_id
        GROUP BY e.query_id
        ORDER BY e.query_id
    """


def wordpiece_segment_sql(
    max_piece_len: int = 4,
    vocab_size: int = 48,
    max_word_len: int = 12,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.wordpiece_segment_docs: train the char + top-N
    substring vocabulary inline (constant-bounded candidate cross join
    — both engines enumerate positions 1..max_word_len × lengths
    1..max_piece_len and filter to the word), precompute the
    longest-match table with a plain GROUP BY max (aggregates are legal
    outside the recursive term), then replay the greedy walk as a
    recursive CTE of pure joins — each word advances deterministically
    (pos → pos + step), so a word reaches pos = length(word) at most
    once; stuck words never finish and are excluded exactly like the
    Spark side."""
    W, P = int(max_word_len), int(max_piece_len)
    return f"""
        WITH RECURSIVE toked AS (
          SELECT doc_id, text, {tokens()} AS __t__ FROM documents
        ),
        vwords AS (
          SELECT word, count(*) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          WHERE length(word) <= {W}
          GROUP BY word
        ),
        cand AS (
          SELECT substr(word, p, l) AS piece,
                 CAST(sum(wc) AS BIGINT) AS n_occurrences
          FROM vwords,
               generate_series(1, {W}) AS gp(p),
               generate_series(1, {P}) AS gl(l)
          WHERE p <= length(word) AND l <= length(word) - p + 1
          GROUP BY 1
        ),
        pieces AS (
          SELECT piece FROM cand WHERE length(piece) = 1
          UNION ALL
          SELECT piece FROM (
            SELECT piece,
                   row_number() OVER (
                     ORDER BY n_occurrences DESC, piece ASC
                   ) AS rn
            FROM cand WHERE length(piece) >= 2
          ) WHERE rn <= {vocab_size}
        ),
        words AS (
          SELECT DISTINCT word
          FROM (SELECT unnest(__t__) AS word FROM toked)
          WHERE length(word) <= {W}
        ),
        lmatch AS (
          SELECT word, p - 1 AS pos, max(l) AS step
          FROM words,
               generate_series(1, {W}) AS gp(p),
               generate_series(1, {P}) AS gl(l)
          WHERE p <= length(word) AND l <= length(word) - p + 1
            AND substr(word, p, l) IN (SELECT piece FROM pieces)
          GROUP BY word, p
        ),
        walk AS (
          SELECT word, length(word) AS len, 0 AS pos, 0 AS n FROM words
          UNION ALL
          SELECT w.word, w.len, w.pos + l.step, w.n + 1
          FROM walk w JOIN lmatch l
            ON l.word = w.word AND l.pos = w.pos
          WHERE w.pos < w.len
        ),
        word_sub AS (
          SELECT word, CAST(n AS BIGINT) AS nsub
          FROM walk WHERE pos = len
        ),
        tok AS (SELECT doc_id, unnest(__t__) AS word FROM toked),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(nsub) AS BIGINT) AS n_subwords
          FROM tok JOIN word_sub USING (word)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(per.n_tokens, 0) AS n_tokens,
               coalesce(per.n_subwords, 0) AS n_subwords,
               CASE WHEN per.n_tokens > 0
                    THEN round(per.n_subwords * 1.0 / per.n_tokens,
                               {round_digits})
               END AS fertility
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


def wordpiece_fertility_sql(
    group_col: str = "source",
    max_piece_len: int = 4,
    vocab_size: int = 48,
    max_word_len: int = 12,
    round_digits: int = 6,
) -> str:
    """Mirror of textqc.wordpiece_fertility_by_group: the
    wordpiece_segment_sql train + greedy-walk prefix (vocab inline,
    longest-match table, recursive pure-join walk), then the per-group
    fertility rollup of unigram_fertility_sql (tokens longer than
    max_word_len, or stuck mid-walk, drop from the join on both
    sides)."""
    W, P = int(max_word_len), int(max_piece_len)
    return f"""
        WITH RECURSIVE toked AS (
          SELECT doc_id, text, {group_col},
                 {tokens()} AS __t__ FROM documents
        ),
        vwords AS (
          SELECT word, count(*) AS wc
          FROM (SELECT unnest(__t__) AS word FROM toked)
          WHERE length(word) <= {W}
          GROUP BY word
        ),
        cand AS (
          SELECT substr(word, p, l) AS piece,
                 CAST(sum(wc) AS BIGINT) AS n_occurrences
          FROM vwords,
               generate_series(1, {W}) AS gp(p),
               generate_series(1, {P}) AS gl(l)
          WHERE p <= length(word) AND l <= length(word) - p + 1
          GROUP BY 1
        ),
        pieces AS (
          SELECT piece FROM cand WHERE length(piece) = 1
          UNION ALL
          SELECT piece FROM (
            SELECT piece,
                   row_number() OVER (
                     ORDER BY n_occurrences DESC, piece ASC
                   ) AS rn
            FROM cand WHERE length(piece) >= 2
          ) WHERE rn <= {vocab_size}
        ),
        words AS (SELECT word FROM vwords),
        lmatch AS (
          SELECT word, p - 1 AS pos, max(l) AS step
          FROM words,
               generate_series(1, {W}) AS gp(p),
               generate_series(1, {P}) AS gl(l)
          WHERE p <= length(word) AND l <= length(word) - p + 1
            AND substr(word, p, l) IN (SELECT piece FROM pieces)
          GROUP BY word, p
        ),
        walk AS (
          SELECT word, length(word) AS len, 0 AS pos, 0 AS n FROM words
          UNION ALL
          SELECT w.word, w.len, w.pos + l.step, w.n + 1
          FROM walk w JOIN lmatch l
            ON l.word = w.word AND l.pos = w.pos
          WHERE w.pos < w.len
        ),
        word_sub AS (
          SELECT word, CAST(n AS BIGINT) AS nsub,
                 CAST(len AS BIGINT) AS nchr
          FROM walk WHERE pos = len
        ),
        tok AS (
          SELECT {group_col} AS grp, unnest(__t__) AS word FROM toked
        )
        SELECT grp AS {group_col},
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(nsub) AS BIGINT) AS n_subwords,
               round(CAST(sum(nsub) AS DOUBLE) / count(*),
                     {round_digits}) AS fertility,
               round(CAST(sum(nchr) AS DOUBLE) / sum(nsub),
                     {round_digits}) AS chars_per_subword
        FROM tok JOIN word_sub USING (word)
        GROUP BY grp
    """


def unigram_segment_sql(
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_size: int = 64,
    vocab_size: int = 48,
    n_rounds: int = 2,
    round_digits: int = 6,
) -> str:
    """Mirror of catalog.unigram_segment_docs: train the unigram vocab
    inline (shared EM prefix), then apply it per DOCUMENT — one more
    complete-path enumeration for the per-word subword count, rolled up
    per doc_id, empty/uncoverable-only docs kept with 0/NULL."""
    prefix = _unigram_prefix_ctes(
        max_word_len, max_piece_len, seed_size, vocab_size, n_rounds
    )
    n = n_rounds
    return f"""
        WITH RECURSIVE {prefix},
        pf AS (
          SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS pos,
                 [0] AS bounds
          FROM words
          UNION ALL
          SELECT p.word, p.cost + v.lp_milli,
                 p.pos + length(v.piece),
                 list_append(p.bounds, p.pos + length(v.piece))
          FROM pf p JOIN lp{n} v
            ON length(v.piece) <= length(p.word) - p.pos
           AND substr(p.word, p.pos + 1, length(v.piece)) = v.piece
        ),
        bestf AS (
          SELECT word, bounds FROM (
            SELECT word, bounds,
                   row_number() OVER (
                     PARTITION BY word
                     ORDER BY cost DESC,
                              list_reverse(bounds[2:len(bounds) - 1]) ASC
                   ) AS rn
            FROM pf WHERE pos = length(word)
          ) WHERE rn = 1
        ),
        wordsub AS (
          SELECT word, CAST(len(bounds) - 1 AS BIGINT) AS nsub
          FROM bestf
        ),
        tok AS (SELECT doc_id, unnest(__t__) AS word FROM toked),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(nsub) AS BIGINT) AS n_subwords
          FROM tok JOIN wordsub USING (word)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(per.n_tokens, 0) AS n_tokens,
               coalesce(per.n_subwords, 0) AS n_subwords,
               CASE WHEN per.n_tokens > 0
                    THEN round(per.n_subwords * 1.0 / per.n_tokens,
                               {round_digits})
               END AS fertility
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """
