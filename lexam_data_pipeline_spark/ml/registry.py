"""Registry + oracle SQL for the training-data-pipeline extensions.

SQL-expressible extension queries carry a DuckDB oracle (including the
lang-ID heuristic and both embedding-dedup variants); only genuinely
non-ANSI-reproducible ops (xxhash-seeded sketches: MinHash, SimHash,
rolling hash; LSH/IVF bucketing; binary multimodal decode) are declared
rows-only — the driver records the weaker check and the judge sees which.
"""

from __future__ import annotations

from lexam_data_pipeline_spark.ml.dedup import (
    q_containment_dedup,
    q_dedup_clusters,
    q_dedup_clusters_two_phase,
    q_dedup_embedding,
    q_dedup_embedding_blocked,
    q_dedup_exact,
    q_dedup_keep_best,
    q_dedup_ngram_jaccard,
    q_dedup_threshold_sweep,
    q_dedup_rate_by_source,
    q_dedup_segments,
    q_minhash_lsh_pairs,
    q_simhash_buckets,
)
from lexam_data_pipeline_spark.ml.bloom import q_bloom_decontaminate
from lexam_data_pipeline_spark.ml.cms import q_heavy_hitters
from lexam_data_pipeline_spark.ml.decontam import q_decontaminate_docs
from lexam_data_pipeline_spark.ml.curation import (
    q_chunk_overlap,
    q_kfold_assign,
    q_sample_weighted,
    q_curation_pipeline,
    q_pack_sequences,
    q_mix_sources_balanced,
    q_mix_temperature,
    q_pretrain_pipeline,
    q_pii_redact_stats,
    q_sample_bernoulli,
    q_sample_stratified,
    q_split_assign,
    q_url_dedup,
)
from lexam_data_pipeline_spark.ml.dsir import q_dsir_select
from lexam_data_pipeline_spark.ml.graph import q_label_propagation, q_pagerank
from lexam_data_pipeline_spark.ml.kmeans import q_kmeans_clusters
from lexam_data_pipeline_spark.ml.lm import q_lm_surprisal
from lexam_data_pipeline_spark.ml.logreg import q_logreg_quality
from lexam_data_pipeline_spark.ml.boost import q_boosted_stumps
from lexam_data_pipeline_spark.ml.compress import q_compression_ratio
from lexam_data_pipeline_spark.ml.rproj import q_random_projection
from lexam_data_pipeline_spark.ml.nb import q_nb_classifier
from lexam_data_pipeline_spark.ml.pca import q_pca_variance
from lexam_data_pipeline_spark.ml.semdedup import q_semantic_dedup
from lexam_data_pipeline_spark.ml.ivf import q_knn_ivf
from lexam_data_pipeline_spark.ml.retrieval import q_bm25_topk, q_hybrid_rrf
from lexam_data_pipeline_spark.ml.pq import q_knn_ivfpq
from lexam_data_pipeline_spark.ml.multimodal import q_multimodal_features
from lexam_data_pipeline_spark.ml.quantize import q_embedding_quantize
from lexam_data_pipeline_spark.ml.tokenizer import q_bpe_tokenize
from lexam_data_pipeline_spark.ml.similarity import (
    q_hard_negatives,
    q_knn_batch,
    q_knn_bruteforce,
    q_knn_lsh,
)
from lexam_data_pipeline_spark.ml.textstats import (
    q_lexical_rarity,
    q_repetition_stats,
    q_doc_fingerprint,
    q_doc_rolling_hash,
    q_lang_id,
    q_text_quality,
    q_tfidf_top_terms,
    q_token_count_regex,
)

ML_QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_keep_best": q_dedup_keep_best,
    "q_dedup_clusters": q_dedup_clusters,
    "q_dedup_clusters_two_phase": q_dedup_clusters_two_phase,
    "q_dedup_embedding": q_dedup_embedding,
    "q_dedup_embedding_blocked": q_dedup_embedding_blocked,
    "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "q_dedup_threshold_sweep": q_dedup_threshold_sweep,
    "q_dedup_rate_by_source": q_dedup_rate_by_source,
    "q_containment_dedup": q_containment_dedup,
    "q_minhash_lsh_pairs": q_minhash_lsh_pairs,
    "q_simhash_buckets": q_simhash_buckets,
    "q_knn_bruteforce": q_knn_bruteforce,
    "q_knn_batch": q_knn_batch,
    "q_knn_lsh": q_knn_lsh,
    "q_knn_ivf": q_knn_ivf,
    "q_knn_ivfpq": q_knn_ivfpq,
    "q_text_quality": q_text_quality,
    "q_tfidf_top_terms": q_tfidf_top_terms,
    "q_token_count_regex": q_token_count_regex,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_doc_rolling_hash": q_doc_rolling_hash,
    "q_lang_id": q_lang_id,
    "q_multimodal_features": q_multimodal_features,
    "q_sample_bernoulli": q_sample_bernoulli,
    "q_sample_weighted": q_sample_weighted,
    "q_embedding_quantize": q_embedding_quantize,
    "q_sample_stratified": q_sample_stratified,
    "q_pii_redact_stats": q_pii_redact_stats,
    "q_url_dedup": q_url_dedup,
    "q_curation_pipeline": q_curation_pipeline,
    "q_mix_sources_balanced": q_mix_sources_balanced,
    "q_decontaminate_docs": q_decontaminate_docs,
    "q_bloom_decontaminate": q_bloom_decontaminate,
    "q_heavy_hitters": q_heavy_hitters,
    "q_pack_sequences": q_pack_sequences,
    "q_repetition_stats": q_repetition_stats,
    "q_dedup_segments": q_dedup_segments,
    "q_mix_temperature": q_mix_temperature,
    "q_lexical_rarity": q_lexical_rarity,
    "q_pretrain_pipeline": q_pretrain_pipeline,
    "q_chunk_overlap": q_chunk_overlap,
    "q_split_assign": q_split_assign,
    "q_bm25_topk": q_bm25_topk,
    "q_hybrid_rrf": q_hybrid_rrf,
    "q_pagerank": q_pagerank,
    "q_label_propagation": q_label_propagation,
    "q_hard_negatives": q_hard_negatives,
    "q_bpe_tokenize": q_bpe_tokenize,
    "q_kfold_assign": q_kfold_assign,
    "q_logreg_quality": q_logreg_quality,
    "q_kmeans_clusters": q_kmeans_clusters,
    "q_pca_variance": q_pca_variance,
    "q_lm_surprisal": q_lm_surprisal,
    "q_semantic_dedup": q_semantic_dedup,
    "q_dsir_select": q_dsir_select,
    "q_nb_classifier": q_nb_classifier,
    "q_boosted_stumps": q_boosted_stumps,
    "q_compression_ratio": q_compression_ratio,
    "q_random_projection": q_random_projection,
}

_SHINGLES = """
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 1)),
                   i -> array_to_string(toks[i:i+2], ' '))) AS shingles
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents)
"""

def _balanced_sum_sql(terms: list[str]) -> str:
    """Sum term strings as a balanced binary tree with explicit parens —
    the EXACT tree ml/dedup._balanced_sum builds in Spark.  FP addition
    is order-sensitive; identical trees → bit-identical doubles."""
    while len(terms) > 1:
        terms = [
            f"({terms[i]} + {terms[i + 1]})" if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


_EMB_DIM = 64
_NORM2_SQL = _balanced_sum_sql([f"(e[{i + 1}] * e[{i + 1}])" for i in range(_EMB_DIM)])
_DOT_SQL = _balanced_sum_sql([f"(a.en[{i + 1}] * b.en[{i + 1}])" for i in range(_EMB_DIM)])

ML_ORACLE_EMBEDDING = f"""
        -- mirrors the Spark plan op-for-op: divide each component by the
        -- row norm FIRST, then balanced-tree-sum the pairwise products
        -- (the generated parens match ml/dedup._balanced_sum) — bit-
        -- identical doubles on both engines
        WITH n AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
            FROM embeddings
        ),
        u AS (
            SELECT vec_id,
                   list_transform(e, x -> x / sqrt({_NORM2_SQL})) AS en
            FROM n
        ),
        pairs AS (
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   {_DOT_SQL} AS cos_raw
            FROM u a JOIN u b ON a.vec_id < b.vec_id
        )
        SELECT vec_id_a, vec_id_b, round(cos_raw, 6) AS cosine
        FROM pairs WHERE cos_raw >= 0.45
"""

ML_ORACLES: dict[str, str] = {
    "q_dedup_embedding": ML_ORACLE_EMBEDDING,
    "q_dedup_embedding_blocked": ML_ORACLE_EMBEDDING,
    "q_dedup_clusters": f"""
        WITH RECURSIVE pairs_g AS (

        WITH sh AS ({_SHINGLES}),
        ex_all AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ),
        rare AS (
            SELECT s FROM ex_all GROUP BY s HAVING count(*) <= 50
        ),
        ex_rare AS (
            SELECT doc_id, ex_all.s AS s FROM ex_all JOIN rare USING (s)
        ),
        ex AS (
            SELECT doc_id, s,
                   count(*) OVER (PARTITION BY doc_id) AS n_sh
            FROM ex_rare
        ),
        pairs AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   a.n_sh AS na, b.n_sh AS nb, count(*) AS common
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_id_a, doc_id_b,
               round(common / (na + nb - common), 4) AS jaccard
        FROM pairs
        WHERE common / (na + nb - common) >= 0.5
    
        ),
        nodes AS (
            SELECT doc_id_a AS node FROM pairs_g
            UNION SELECT doc_id_b FROM pairs_g
        ),
        sym AS (
            SELECT doc_id_a AS a, doc_id_b AS b FROM pairs_g
            UNION SELECT doc_id_b, doc_id_a FROM pairs_g
        ),
        reach(src, dst) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT r.src, e.b FROM reach r JOIN sym e ON r.dst = e.a
        )
        SELECT src AS doc_id, min(dst) AS cluster_id
        FROM reach GROUP BY src
    """,
    "q_dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "q_dedup_ngram_jaccard": f"""
        WITH sh AS ({_SHINGLES}),
        ex_all AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ),
        rare AS (
            SELECT s FROM ex_all GROUP BY s HAVING count(*) <= 50
        ),
        ex_rare AS (
            SELECT doc_id, ex_all.s AS s FROM ex_all JOIN rare USING (s)
        ),
        ex AS (
            SELECT doc_id, s,
                   count(*) OVER (PARTITION BY doc_id) AS n_sh
            FROM ex_rare
        ),
        pairs AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   a.n_sh AS na, b.n_sh AS nb, count(*) AS common
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_id_a, doc_id_b,
               round(common / (na + nb - common), 4) AS jaccard
        FROM pairs
        WHERE common / (na + nb - common) >= 0.5
    """,
    "q_dedup_threshold_sweep": f"""
        WITH sh AS ({_SHINGLES}),
        ex_all AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ),
        rare AS (
            SELECT s FROM ex_all GROUP BY s HAVING count(*) <= 50
        ),
        ex_rare AS (
            SELECT doc_id, ex_all.s AS s FROM ex_all JOIN rare USING (s)
        ),
        ex AS (
            SELECT doc_id, s,
                   count(*) OVER (PARTITION BY doc_id) AS n_sh
            FROM ex_rare
        ),
        pairs AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   a.n_sh AS na, b.n_sh AS nb, count(*) AS common
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ),
        qual AS (
            SELECT unnest(generate_series(1,
                       least(9, (10 * common) // (na + nb - common)))) AS t10,
                   doc_id_a, doc_id_b
            FROM pairs
            WHERE (10 * common) // (na + nb - common) >= 1
        ),
        np AS (SELECT t10, count(*) AS n_pairs FROM qual GROUP BY t10),
        nd AS (
            SELECT t10, count(DISTINCT d) AS n_docs
            FROM (SELECT t10, doc_id_a AS d FROM qual
                  UNION ALL SELECT t10, doc_id_b FROM qual)
            GROUP BY t10
        )
        SELECT CAST(np.t10 AS INT) AS t10,
               np.t10 / 10.0 AS threshold,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(n_docs AS BIGINT) AS n_docs
        FROM np JOIN nd ON np.t10 = nd.t10
        ORDER BY t10
    """,
    "q_dedup_rate_by_source": f"""
        WITH sh AS ({_SHINGLES}),
        ex_all AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ),
        rare AS (
            SELECT s FROM ex_all GROUP BY s HAVING count(*) <= 50
        ),
        ex_rare AS (
            SELECT doc_id, ex_all.s AS s FROM ex_all JOIN rare USING (s)
        ),
        ex AS (
            SELECT doc_id, s,
                   count(*) OVER (PARTITION BY doc_id) AS n_sh
            FROM ex_rare
        ),
        pairs AS (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   a.n_sh AS na, b.n_sh AS nb, count(*) AS common
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ),
        near AS (
            SELECT doc_id_a, doc_id_b FROM pairs
            WHERE common / (na + nb - common) >= 0.5
        ),
        tagged AS (
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   n.doc_id_a, n.doc_id_b
            FROM near n
            JOIN documents da ON n.doc_id_a = da.doc_id
            JOIN documents db ON n.doc_id_b = db.doc_id
        ),
        cells AS (
            SELECT source_a, source_b, count(*) AS n_pairs
            FROM tagged GROUP BY source_a, source_b
        ),
        touched AS (
            SELECT source_a, source_b, count(DISTINCT d) AS n_docs_touched
            FROM (SELECT source_a, source_b, doc_id_a AS d FROM tagged
                  UNION ALL SELECT source_a, source_b, doc_id_b FROM tagged)
            GROUP BY source_a, source_b
        )
        SELECT c.source_a, c.source_b,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(n_docs_touched AS BIGINT) AS n_docs_touched
        FROM cells c JOIN touched t
          ON c.source_a = t.source_a AND c.source_b = t.source_b
        ORDER BY c.source_a, c.source_b
    """,
    "q_knn_batch": """
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb
            FROM embeddings ORDER BY vec_id LIMIT 4
        ),
        scored AS (
            SELECT q.q_id, e.vec_id, e.label,
                   list_reduce(list_transform(generate_series(1, len(e.embedding)),
                       i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
                          i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(generate_series(1, len(q.q_emb)),
                          i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)))
                   AS cos_raw
            FROM embeddings e, q
            WHERE e.vec_id <> q.q_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY q_id
                                         ORDER BY cos_raw DESC, vec_id) AS rnk
            FROM scored
        )
        SELECT q_id, vec_id, label, CAST(rnk AS INT) AS rnk,
               round(cos_raw, 6) AS cosine
        FROM ranked WHERE rnk <= 5
    """,
    "q_knn_bruteforce": """
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb
            FROM embeddings ORDER BY vec_id LIMIT 1
        ),
        scored AS (
            SELECT e.vec_id, e.label,
                   list_reduce(list_transform(generate_series(1, len(e.embedding)),
                       i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)
                   / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
                          i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(generate_series(1, len(q.q_emb)),
                          i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)))
                   AS cos_raw
            FROM embeddings e, q
            WHERE e.vec_id <> q.q_id
        )
        SELECT vec_id, label, round(cos_raw, 6) AS cosine
        FROM scored
        ORDER BY cos_raw DESC, vec_id ASC
        LIMIT 10
    """,
    "q_text_quality": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_words,
               round(list_reduce(list_transform(regexp_split_to_array(trim(text), '\\s+'),
                         t -> len(t)), (x, y) -> x + y)
                     / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS avg_word_len,
               round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))
                     / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS stopword_ratio
        FROM documents
    """,
    "q_token_count_regex": """
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
                    AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang
    """,
    "q_doc_fingerprint": f"""
        SELECT doc_id,
               list_min(list_transform(shingles, s -> md5(s))) AS fingerprint
        FROM ({_SHINGLES}) sh
    """,
    # Rabin–Karp fold with the md5-prefix token seed — the 0-seeded
    # Spark aggregate() becomes a 0-prepended list_reduce (DuckDB's
    # reduce seeds from the first element).
    "q_doc_rolling_hash": """
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           regexp_split_to_array(trim(text), '\\s+'),
                           t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)
                                % 2147483647)),
                   (acc, h) -> (acc * 131 + h) % 2147483647
               ) AS rhash
        FROM documents
    """,
    "q_lang_id": """
        WITH toks AS (
            SELECT doc_id, lang,
                   list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                  t -> lower(t)) AS toks
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, t -> t IN ('the', 'and', 'of', 'to', 'is'))) AS score_en,
                   len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS score_de,
                   len(list_filter(toks, t -> t IN ('le', 'la', 'les', 'et', 'est'))) AS score_fr,
                   len(list_filter(toks, t -> t IN ('el', 'la', 'los', 'y', 'es'))) AS score_es
            FROM toks
        ),
        best_t AS (
            SELECT *, greatest(score_en, score_de, score_fr, score_es) AS best
            FROM scored
        )
        SELECT doc_id, lang,
               CASE WHEN best <= 0 THEN 'unknown'
                    WHEN score_en = best THEN 'en'
                    WHEN score_de = best THEN 'de'
                    WHEN score_fr = best THEN 'fr'
                    WHEN score_es = best THEN 'es'
               END AS predicted_lang
        FROM best_t
    """,
    "q_tfidf_top_terms": """
        WITH terms AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
                  FROM documents) t
            WHERE t.term <> ''
            GROUP BY doc_id, t.term
        ),
        with_df AS (
            SELECT doc_id, term, tf,
                   count(*) OVER (PARTITION BY term) AS df
            FROM terms
        ),
        ranked AS (
            SELECT doc_id, term, tf, df,
                   round(tf::DOUBLE / df, 6) AS weight,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY round(tf::DOUBLE / df, 6) DESC, term ASC) AS rank
            FROM with_df
        )
        SELECT doc_id, term, tf, CAST(df AS BIGINT) AS df, weight, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """,
    "q_dedup_keep_best": """
        SELECT doc_id, n_copies FROM (
            SELECT doc_id,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY n_chars DESC, doc_id ASC) AS rn,
                   CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies
            FROM documents
        ) WHERE rn = 1
    """,
}

# the two CC algorithms compute the same labels (component min), so the
# two-phase variant is verified by the identical transitive-closure oracle
ML_ORACLES["q_dedup_clusters_two_phase"] = ML_ORACLES["q_dedup_clusters"]

# --- curation (ml/curation.py): all four oracle-checked -------------------

#: mirrors curation.PII_PATTERNS / curation._with_synthetic_pii verbatim;
#: patterns stay inside the RE2 ∩ java.util.regex common dialect.
_PII_AUG_SQL = r"""
    SELECT lang,
           text || ' contact user' || cast(doc_id AS VARCHAR) || '@' || source
                || '.example.com at 10.' || cast(doc_id % 256 AS VARCHAR)
                || '.0.' || cast(doc_id % 250 + 1 AS VARCHAR)
                || ' or +41-79-' || lpad(cast(doc_id % 9999999 AS VARCHAR), 7, '0')
           AS aug
    FROM documents
"""

_PII_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(aug, "
    r"'https?://[^\s]+', '<URL>', 'g'), "
    r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'), "
    r"'\+\d{1,3}-\d{2,4}-\d{4,9}', '<PHONE>', 'g')"
)

#: mirrors curation._with_synthetic_urls / normalize_url verbatim.
_URL_NORM_SQL = r"""
    SELECT doc_id,
           regexp_extract(lower(url), '^https?://(?:www\.)?([^/:?#]+)', 1)
             || regexp_replace(
                    regexp_extract(lower(url), '^https?://[^/?#]*(/[^?#]*)', 1),
                    '/$', '') AS norm_url
    FROM (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://'
               || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
               || source || '.example.com'
               || (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
               || '/docs/' || cast(doc_id % 97 AS VARCHAR)
               || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed#frag' ELSE '' END)
               AS url
        FROM documents
    )
"""

ML_ORACLES["q_sample_bernoulli"] = """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 8) < '40000000'
"""

# NOTE: no prefilter here on purpose — the Spark side runs the 0.5
# hash-prefilter fast path, and agreeing with this unfiltered top-k is
# what proves the prefilter dropped nothing (curation.stratified_sample).
ML_ORACLES["q_sample_stratified"] = """
    SELECT doc_id, lang, sample_rank FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY substr(md5(cast(doc_id AS VARCHAR)), 1, 8), doc_id
               ) AS sample_rank
        FROM documents
    ) WHERE sample_rank <= 10
"""

ML_ORACLES["q_pii_redact_stats"] = rf"""
    WITH aug AS ({_PII_AUG_SQL}),
    feat AS (
        SELECT lang,
               len(regexp_extract_all(aug, 'https?://[^\s]+')) AS n_url,
               len(regexp_extract_all(aug,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_email,
               len(regexp_extract_all(aug,
                   '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS n_ipv4,
               len(regexp_extract_all(aug, '\+\d{{1,3}}-\d{{2,4}}-\d{{4,9}}')) AS n_phone,
               length(aug) - length({_PII_REDACT_SQL}) AS delta
        FROM aug
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_url) AS BIGINT) AS total_url,
           CAST(sum(n_email) AS BIGINT) AS total_email,
           CAST(sum(n_ipv4) AS BIGINT) AS total_ipv4,
           CAST(sum(n_phone) AS BIGINT) AS total_phone,
           CAST(sum(delta) AS BIGINT) AS chars_removed
    FROM feat GROUP BY lang
"""

ML_ORACLES["q_url_dedup"] = f"""
    WITH n AS ({_URL_NORM_SQL})
    SELECT norm_url, min(doc_id) AS canonical_doc, count(*) AS n_dups
    FROM n GROUP BY norm_url
"""

#: mirrors curation.mix_to_budget balanced-to-min: per-source keep rate
#: min(1, min_total/total) becomes an 8-hex threshold via printf('%08x',
#: floor(rate·2³²)) (clamped to ffffffff), keep if md5 bucket <= it.
ML_ORACLES["q_mix_sources_balanced"] = r"""
    WITH t AS (
        SELECT doc_id, source,
               len(regexp_extract_all(text, '\S+')) AS n_tok,
               substr(md5('mix' || cast(doc_id AS VARCHAR)), 1, 8) AS bucket
        FROM documents
    ), totals AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS total FROM t GROUP BY source
    ), budget AS (
        SELECT min(total) AS budget FROM totals
    ), rates AS (
        SELECT source,
               printf('%08x',
                      CAST(least(floor(least(budget / total, 1.0) * 4294967296.0),
                                 4294967295) AS BIGINT)) AS thresh
        FROM totals, budget
    )
    SELECT t.source, count(*) AS n_docs, CAST(sum(t.n_tok) AS BIGINT) AS tokens_kept
    FROM t JOIN rates ON t.source = rates.source
    WHERE t.bucket <= rates.thresh
    GROUP BY t.source
"""

#: mirrors curation.curate_corpus at gate 25–80 + 50% sample: quality
#: gate → first-id-per-content-hash dedup → md5-threshold sample.
ML_ORACLES["q_curation_pipeline"] = r"""
    WITH gated AS (
        SELECT doc_id, lang, text,
               CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_words
        FROM documents
        WHERE len(regexp_extract_all(text, '\S+')) BETWEEN 25 AND 80
    ), dedup AS (
        SELECT doc_id, lang, n_words,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated
    )
    SELECT doc_id, lang, n_words
    FROM dedup
    WHERE rn = 1 AND substr(md5(cast(doc_id AS VARCHAR)), 1, 8) < '80000000'
"""

#: mirrors decontam.q_decontaminate_docs: 4-gram shingles (clamped to one
#: whole-text shingle for <4-word docs, same as _SHINGLES), benchmark =
#: every 10th doc, count distinct shared grams + distinct bench docs hit.
#: exact SQL for the BLOOM-prefiltered sweep (ml/bloom.py, %7 split,
#: 5-grams): the oracle knows nothing about the sketch — a hash-match
#: proves the prefilter+confirm composite is output-identical to exact
#: decontamination.
ML_ORACLES["q_bloom_decontaminate"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 4, 1)),
                   i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        FROM toks
    ), bench AS (
        SELECT DISTINCT doc_id AS bench_id, gram FROM g WHERE doc_id % 7 = 0
    ), corpus AS (
        SELECT doc_id, gram FROM g WHERE doc_id % 7 <> 0
    )
    SELECT c.doc_id,
           count(DISTINCT c.gram) AS n_hit_grams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
"""

ML_ORACLES["q_decontaminate_docs"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 3, 1)),
                   i -> array_to_string(toks[i:i+3], ' ')))) AS gram
        FROM toks
    ), bench AS (
        SELECT DISTINCT doc_id AS bench_id, gram FROM g WHERE doc_id % 10 = 0
    ), corpus AS (
        SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 0
    )
    SELECT c.doc_id,
           count(DISTINCT c.gram) AS n_hit_grams,
           count(DISTINCT b.bench_id) AS n_bench_docs
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
"""

#: mirrors curation.q_pack_sequences: global token prefix-sum in doc_id
#: order (the oracle's single window equals the engine's two-level
#: bucket prefix sum exactly — integer arithmetic, no float folds),
#: seq_id = start-offset div 512.
ML_ORACLES["q_pack_sequences"] = r"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, n_tok,
               CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                    - n_tok AS BIGINT) AS tok_start
        FROM t
    )
    SELECT CAST(floor(tok_start / 512) AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c GROUP BY 1
"""

#: mirrors textstats.q_repetition_stats: whitespace tokens, bigram
#: shingles with the <2-word whole-text clamp, max per-doc bigram count,
#: frac over greatest(n_words-1, 1).
ML_ORACLES["q_repetition_stats"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, len(toks) AS n_words,
               len(list_distinct(toks)) AS n_distinct_words,
               unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 1)),
                   i -> array_to_string(toks[i:i+1], ' '))) AS gram
        FROM t
    ), bc AS (
        SELECT doc_id, n_words, n_distinct_words, gram, count(*) AS c
        FROM g GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, n_words, n_distinct_words,
           max(c) AS top_bigram_n,
           count(*) AS n_distinct_bigrams,
           round(max(c) / greatest(n_words - 1, 1), 6) AS top_bigram_frac
    FROM bc GROUP BY 1, 2, 3
"""

#: mirrors dedup.q_dedup_segments: non-overlapping 8-token segments
#: (>=1 per doc), first corpus-wide occurrence wins by (doc_id, pos);
#: the Spark side windows on md5(segment) but the winner set is
#: identical because md5 is injective over the fixture segments.
ML_ORACLES["q_dedup_segments"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, len(toks) AS n, toks,
               unnest(generate_series(
                   0, CAST(greatest(ceil(len(toks) / 8.0), 1) AS INT) - 1)) AS seg
        FROM t
    ), g AS (
        SELECT doc_id, seg,
               array_to_string(toks[seg * 8 + 1 : seg * 8 + 8], ' ') AS seg_text,
               least(8, n - seg * 8) AS seg_tok
        FROM s
    ), w AS (
        SELECT doc_id, seg_tok,
               row_number() OVER (PARTITION BY seg_text ORDER BY doc_id, seg) AS rn
        FROM g
    )
    SELECT doc_id,
           count(*) AS n_segments,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn = 1 THEN seg_tok ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM w GROUP BY 1
"""

#: mirrors curation.q_mix_temperature (alpha = 0.5): per-source keep
#: rate sqrt(T_min / T_s) as an md5 hash threshold.  sqrt and double
#: division are correctly-rounded IEEE ops, floor-before-cast avoids
#: DuckDB's round-on-cast, and hex is lowercased/padded on both sides,
#: so the thresholds are bit-identical across engines.
ML_ORACLES["q_mix_temperature"] = r"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
        FROM documents
    ), totals AS (
        SELECT source, CAST(sum(n_tok) AS DOUBLE) AS t FROM d GROUP BY 1
    ), rates AS (
        SELECT source,
               lpad(lower(hex(least(
                   CAST(floor(sqrt(min(t) OVER () / t) * 4294967296.0) AS BIGINT),
                   4294967295))), 8, '0') AS thresh
        FROM totals
    )
    SELECT d.source, count(*) AS n_docs, CAST(sum(d.n_tok) AS BIGINT) AS tokens_kept
    FROM d JOIN rates USING (source)
    WHERE substr(md5(concat('tmix', CAST(d.doc_id AS VARCHAR))), 1, 8) < rates.thresh
    GROUP BY 1
"""

#: mirrors curation.chunk_windows: starts generate_series(0, n-1, 24),
#: 1-based slice, chunk length least(32, n - start) — all integer-exact.
ML_ORACLES["q_chunk_overlap"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, len(toks) AS n, toks,
               unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start // 24 AS INT) AS chunk_idx,
           CAST(start AS INT) AS chunk_start,
           CAST(least(32, n - start) AS INT) AS n_chunk_tokens,
           toks[start + 1] AS first_tok
    FROM s
"""

#: mirrors curation.split_assign: first hex char of md5('split' || id),
#: 0-b train / c-d val / e-f test.
ML_ORACLES["q_split_assign"] = r"""
    WITH d AS (
        SELECT source,
               CASE
                   WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 1)
                        BETWEEN '0' AND 'b' THEN 'train'
                   WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 1)
                        IN ('c', 'd') THEN 'val'
                   ELSE 'test'
               END AS split,
               len(regexp_extract_all(text, '\S+')) AS n_tok
        FROM documents
    )
    SELECT source, split, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM d GROUP BY 1, 2
"""

#: mirrors textstats.q_lexical_rarity: corpus term frequencies joined
#: back per token; mean frequency is exact-int sum / exact count, one
#: IEEE division.
ML_ORACLES["q_lexical_rarity"] = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ), v AS (
        SELECT tok, count(*) AS tf FROM tok GROUP BY 1
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(tf) AS BIGINT) AS freq_mass,
           CAST(sum(tf) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tok_freq,
           CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
    FROM tok JOIN v USING (tok)
    GROUP BY 1
"""

#: mirrors curation.q_pretrain_pipeline stage-for-stage: quality gate,
#: 6-gram decontamination against the every-10th held-out split, exact
#: dedup by md5(text) with lowest-doc_id winner, then the alpha=0.5
#: temperature mix with thresholds computed on the cleaned corpus.
ML_ORACLES["q_pretrain_pipeline"] = r"""
    WITH d AS (
        SELECT doc_id, source, text,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
        FROM documents
    ), ok AS (
        SELECT * FROM d WHERE n_tok >= 20
    ), t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM ok
    ), g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 5, 1)),
                   i -> array_to_string(toks[i:i+5], ' ')))) AS gram
        FROM t
    ), bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0
    ), dirty AS (
        SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
        WHERE g.doc_id % 10 <> 0
    ), clean AS (
        SELECT * FROM ok
        WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
    ), dedup AS (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM clean
    ), kept AS (
        SELECT * FROM dedup WHERE rn = 1
    ), totals AS (
        SELECT source, CAST(sum(n_tok) AS DOUBLE) AS t FROM kept GROUP BY 1
    ), rates AS (
        SELECT source,
               lpad(lower(hex(least(
                   CAST(floor(sqrt(min(t) OVER () / t) * 4294967296.0) AS BIGINT),
                   4294967295))), 8, '0') AS thresh
        FROM totals
    )
    SELECT kept.source, count(*) AS n_docs, CAST(sum(kept.n_tok) AS BIGINT) AS tokens_kept
    FROM kept JOIN rates USING (source)
    WHERE substr(md5(concat('tmix', CAST(kept.doc_id AS VARCHAR))), 1, 8) < rates.thresh
    GROUP BY 1
"""

#: containment is directional, so the self-join keeps BOTH orders
#: (a != b) and divides by the left side's rare-shingle vocabulary;
#: identical MAX_DF cap and integer threshold as the engine.
ML_ORACLES["q_containment_dedup"] = f"""
    WITH sh AS ({_SHINGLES}),
    ex_all AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ),
    rare AS (
        SELECT s FROM ex_all GROUP BY s HAVING count(*) <= 50
    ),
    ex_rare AS (
        SELECT doc_id, ex_all.s AS s FROM ex_all JOIN rare USING (s)
    ),
    ex AS (
        SELECT doc_id, s,
               count(*) OVER (PARTITION BY doc_id) AS n_sh
        FROM ex_rare
    ),
    pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               a.n_sh AS na, count(*) AS common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY 1, 2, 3
    )
    SELECT doc_id_a, doc_id_b, round(common / na, 4) AS containment
    FROM pairs WHERE common * 5 >= na * 4
"""

#: the md5-replication weighted sample is pure string/hash/integer work,
#: so the oracle reproduces the EXACT selection (not just its size).
ML_ORACLES["q_sample_weighted"] = """
    WITH w AS (
        SELECT doc_id, CAST(1 + doc_id_w AS INT) AS w FROM (
            SELECT doc_id, n_chars % 8 AS doc_id_w FROM documents
        )
    ),
    e AS (
        SELECT doc_id, w, unnest(generate_series(0, w - 1)) AS i FROM w
    ),
    h AS (
        SELECT doc_id, w,
               substr(md5('ws1:' || CAST(doc_id AS VARCHAR) || ':'
                          || CAST(i AS VARCHAR)), 1, 8) AS hh
        FROM e
    )
    SELECT doc_id, w, max(hh) AS priority
    FROM h GROUP BY 1, 2
    ORDER BY priority DESC, doc_id ASC
    LIMIT 50
"""

#: int8 floor-quantization: everything after the per-vector scale is
#: integer arithmetic — exact across engines.
ML_ORACLES["q_embedding_quantize"] = """
    WITH n AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, e,
               list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
        FROM n
    ),
    q AS (
        SELECT vec_id,
               list_transform(e, x -> CAST(floor(x / scale) AS INT)) AS qv
        FROM s WHERE scale > 0
    )
    SELECT vec_id,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv,
                x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS q_norm2,
           CAST(list_max(qv) AS INT) AS q_max,
           CAST(list_min(qv) AS INT) AS q_min
    FROM q
"""

#: the oracle computes heavy hitters the expensive way (full GROUP BY
#: over every token occurrence) — hash-match proves the CMS prefilter +
#: exact confirm path is output-invariant.
ML_ORACLES["q_heavy_hitters"] = r"""
    WITH occ AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    occ_nz AS (SELECT token FROM occ WHERE len(token) > 0),
    t AS (SELECT greatest(CAST(floor(count(*) * 0.002) AS BIGINT), 2) AS thr
          FROM occ_nz)
    SELECT token, count(*) AS n_occurrences
    FROM occ_nz GROUP BY 1
    HAVING count(*) >= (SELECT thr FROM t)
"""


# BM25 / hybrid retrieval: rational idf (no libm ln) + floor-scaled int64
# per-term scores → order-independent sums; constants injected from the
# SAME Python floats the Spark plan uses (ml/retrieval.py).
def _bm25_cte() -> str:
    from lexam_data_pipeline_spark.ml.retrieval import (
        B,
        K1,
        K1_PLUS_1,
        QUERY_TERMS,
        SCORE_SCALE,
    )

    terms_sql = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
        base AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents
        ),
        docs_t AS (
            SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM base
        ),
        stats AS (
            SELECT count(*) AS n_docs,
                   CAST(sum(dl) AS BIGINT) / count(*) AS avgdl
            FROM docs_t
        ),
        postings AS (
            SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs_t)
            WHERE term IN ({terms_sql})
            GROUP BY doc_id, dl, term
        ),
        dfs AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
        scored AS (
            SELECT p.doc_id,
                   -- every float literal cast: DuckDB types bare 2.2 as
                   -- DECIMAL(2,1), whose exact-then-convert arithmetic can
                   -- differ from Spark's double path by 1 ulp — enough to
                   -- flip floor() at integer boundaries
                   CAST(floor(((s.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE))
                        * ((p.tf * {K1_PLUS_1!r}::DOUBLE) / (p.tf + {K1!r}::DOUBLE * (1.0::DOUBLE - {B!r}::DOUBLE + {B!r}::DOUBLE * (p.dl / s.avgdl))))
                        * {float(SCORE_SCALE)!r}::DOUBLE) AS BIGINT) AS s_term
            FROM postings p JOIN dfs d USING (term) CROSS JOIN stats s
        ),
        bm25_t AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
                   CAST(sum(s_term) AS BIGINT) AS score_scaled
            FROM scored GROUP BY doc_id
        )
    """


ML_ORACLES["q_bm25_topk"] = f"""
    WITH {_bm25_cte()}
    SELECT doc_id, n_terms, score_scaled,
           round(score_scaled / 1000000.0, 4) AS bm25
    FROM bm25_t
    ORDER BY score_scaled DESC, doc_id ASC
    LIMIT 10
"""

ML_ORACLES["q_hybrid_rrf"] = f"""
    WITH {_bm25_cte()},
    lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score_scaled DESC, doc_id ASC)
                    AS INT) AS r_lex
        FROM bm25_t
        ORDER BY score_scaled DESC, doc_id ASC
        LIMIT 50
    ),
    q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings ORDER BY vec_id LIMIT 1
    ),
    cos_t AS (
        SELECT e.vec_id,
               list_reduce(list_transform(generate_series(1, len(e.embedding)),
                   i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(generate_series(1, len(q.q_emb)),
                      i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)))
               AS cos
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    ),
    vec AS (
        SELECT vec_id AS doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS r_vec
        FROM cos_t
        ORDER BY cos DESC, vec_id ASC
        LIMIT 50
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, r_lex, r_vec,
               (COALESCE(1000000000 // (60 + r_lex), 0)
                + COALESCE(1000000000 // (60 + r_vec), 0)) AS rrf_scaled
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, r_lex, r_vec, CAST(rrf_scaled AS BIGINT) AS rrf_scaled
    FROM fused
    ORDER BY rrf_scaled DESC, doc_id ASC
    LIMIT 10
"""


ML_ORACLES["q_hard_negatives"] = """
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings ORDER BY vec_id LIMIT 4
    ),
    scored AS (
        SELECT q.q_id, e.vec_id, e.label,
               list_reduce(list_transform(generate_series(1, len(e.embedding)),
                   i -> e.embedding[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(generate_series(1, len(q.q_emb)),
                      i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE), (x, y) -> x + y)))
               AS cos_raw
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    ),
    kept AS (SELECT * FROM scored WHERE cos_raw < 0.95),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos_raw DESC, vec_id) AS rnk
        FROM kept
    )
    SELECT q_id, vec_id, label, CAST(rnk AS INT) AS rnk,
           round(cos_raw, 6) AS cosine
    FROM ranked WHERE rnk <= 3
"""


def _kfold_oracle(k: int = 5, salt: str = "fold") -> str:
    from lexam_data_pipeline_spark.ml.curation import hex_threshold

    cases = " ".join(
        f"+ CASE WHEN substring(md5(concat('{salt}', CAST(doc_id AS VARCHAR))), 1, 8)"
        f" >= '{hex_threshold(i / k)}' THEN 1 ELSE 0 END"
        for i in range(1, k)
    )
    return rf"""
        SELECT (0 {cases}) AS fold,
               count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    """


ML_ORACLES["q_kfold_assign"] = _kfold_oracle()


def _lpa_oracle_sql(n_iter: int) -> str:
    """Unrolled synchronous min-tiebreak LPA over the mutual-top-K
    co-purchase graph (same `pairs` build as the q_triangle_count
    oracle) — one CTE pair per iteration, so the oracle replays the
    EXACT deterministic fixpoint steps, not an equivalent algorithm."""
    sql = """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    support AS (
        SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS support
        FROM li a
        JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT u, v, support FROM support
        UNION ALL
        SELECT v AS u, u AS v, support FROM support
    ),
    kept AS (
        SELECT u, v FROM (
            SELECT u, v,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY support DESC, v ASC) AS rn
            FROM directed
        ) WHERE rn <= 10
    ),
    pairs AS (
        SELECT f.u, f.v
        FROM kept f JOIN kept r ON f.u = r.v AND f.v = r.u
        WHERE f.u < f.v
    ),
    und AS (
        SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
    ),
    l0 AS (
        SELECT DISTINCT u AS node, u AS label FROM und
    )"""
    for i in range(1, n_iter + 1):
        sql += f""",
    c{i} AS (
        SELECT e.u AS node, l.label, count(*) AS c
        FROM und e JOIN l{i - 1} l ON e.v = l.node
        GROUP BY 1, 2
    ),
    l{i} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, label ASC) AS rn
            FROM c{i}
        ) WHERE rn = 1
    )"""
    sql += f"""
    SELECT CAST(label AS BIGINT) AS community, CAST(count(*) AS BIGINT) AS size
    FROM l{n_iter}
    GROUP BY label
    ORDER BY size DESC, community ASC
    LIMIT 20
"""
    return sql


ML_ORACLES["q_label_propagation"] = _lpa_oracle_sql(4)


def _pagerank_oracle_sql(n_iter: int) -> str:
    """Unrolled fixed-point PageRank over the symmetrized
    customer↔supplier graph — integer arithmetic only (`` // `` ports to
    Spark's ``div`` mechanically), so every engine replays the EXACT
    iterate: init ``scale // n``, per-edge contribution
    ``r // out_deg``, update ``teleport + (85·Σc) // 100``.  One CTE per
    iteration (single reference each — linear under CTE inlining, the
    q_label_propagation lesson)."""
    sql = """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    prs AS (
        SELECT DISTINCT o.o_custkey * 2 AS cust_node,
               l.l_suppkey * 2 + 1 AS supp_node
        FROM li l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT cust_node AS src, supp_node AS dst FROM prs
        UNION ALL
        SELECT supp_node AS src, cust_node AS dst FROM prs
    ),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    ew AS (
        SELECT e.src, e.dst, d.out_deg FROM edges e JOIN deg d ON e.src = d.src
    ),
    cnt AS (SELECT count(*) AS n FROM deg),
    r0 AS (
        SELECT d.src AS node, 1000000000000 // c.n AS r
        FROM deg d CROSS JOIN cnt c
    )"""
    for i in range(1, n_iter + 1):
        sql += f""",
    r{i} AS (
        SELECT e.dst AS node,
               (15 * 1000000000000) // (100 * c.n)
                   + (85 * sum(r.r // e.out_deg)) // 100 AS r
        FROM ew e JOIN r{i - 1} r ON e.src = r.node CROSS JOIN cnt c
        GROUP BY e.dst, c.n
    )"""
    sql += f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           CAST(node // 2 AS BIGINT) AS key,
           CAST(r AS BIGINT) AS rank_scaled
    FROM r{n_iter}
    ORDER BY r DESC, node ASC
    LIMIT 20
"""
    return sql


ML_ORACLES["q_pagerank"] = _pagerank_oracle_sql(4)


# DSIR importance selection: md5 bucketing, integer counts, and the
# identically associated IEEE division chain — mirrors ml/dsir.py
# expression for expression (round(1e6 · ((n_t/t_t) / (n_r/t_r)))).
ML_ORACLES["q_dsir_select"] = """
    WITH tb AS (
        SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
        FROM (
            SELECT doc_id, lang,
                   unnest(list_filter(
                       regexp_split_to_array(lower(trim(text)), '\\s+'),
                       x -> x <> '')) AS w
            FROM documents
        )
    ),
    raw AS (SELECT b, count(*) AS n_r FROM tb GROUP BY b),
    tgt AS (SELECT b, count(*) AS n_t FROM tb WHERE lang = 'en' GROUP BY b),
    tot AS (
        SELECT count(*) AS t_r,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_t
        FROM tb
    ),
    w AS (
        SELECT raw.b,
               CAST(round(1e6 * (
                   (CAST(COALESCE(n_t, 0) AS DOUBLE) / CAST(t_t AS DOUBLE))
                   / (CAST(n_r AS DOUBLE) / CAST(t_r AS DOUBLE))
               )) AS BIGINT) AS wgt
        FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
    )
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(wgt) AS BIGINT) AS score
    FROM tb JOIN w USING (b)
    GROUP BY doc_id, lang
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
"""


# Naive Bayes confusion matrix: the weight table is recomputed in SQL
# with the SAME floor(1e6·ln(...)) fixed-point rule (platform libm on
# both sides), so scoring is pure integer arithmetic — see ml/nb.py.
ML_ORACLES["q_nb_classifier"] = """
    WITH tb AS (
        SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
        FROM (
            SELECT doc_id, lang,
                   unnest(list_filter(
                       regexp_split_to_array(lower(trim(text)), '\\s+'),
                       x -> x <> '')) AS w
            FROM documents
        )
    ),
    cls AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT sum(n_docs) AS n_total FROM cls),
    priors AS (
        SELECT lang AS cand,
               CAST(floor(1000000 * ln(CAST(n_docs AS DOUBLE)
                                       / CAST(n_total AS DOUBLE)))
                    AS BIGINT) AS prior
        FROM cls CROSS JOIN tot
    ),
    cnts AS (SELECT lang, b, count(*) AS n FROM tb GROUP BY lang, b),
    tok_tot AS (SELECT lang, sum(n) AS t FROM cnts GROUP BY lang),
    wt AS (
        SELECT c.lang AS cand, printf('%02x', gs.i) AS b,
               CAST(floor(1000000 * ln(
                   CAST(COALESCE(n.n, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(tt.t, 0) + 256 AS DOUBLE)
               )) AS BIGINT) AS w
        FROM cls c
        CROSS JOIN generate_series(0, 255) gs(i)
        LEFT JOIN tok_tot tt ON tt.lang = c.lang
        LEFT JOIN cnts n ON n.lang = c.lang AND n.b = printf('%02x', gs.i)
    ),
    scores AS (
        SELECT tb.doc_id, tb.lang, wt.cand,
               sum(wt.w) + any_value(p.prior) AS score
        FROM tb
        JOIN wt USING (b)
        JOIN priors p ON p.cand = wt.cand
        GROUP BY tb.doc_id, tb.lang, wt.cand
    ),
    pred AS (
        SELECT doc_id, lang, cand AS pred_lang
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, cand ASC
            ) AS rn
            FROM scores
        ) WHERE rn = 1
    )
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred
    GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang
"""


# Boosted stumps, three rounds unrolled as CTEs.  Every quantity is
# exact integer arithmetic (doubling weights, weighted-error sums,
# vote counts); binning replicates the engine's float32→double
# comparisons expression-for-expression — see ml/boost.py.
ML_ORACLES["q_boosted_stumps"] = """
    WITH base AS (
        SELECT vec_id,
               CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
               gs.f AS f,
               CAST(embedding[gs.f + 1] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN generate_series(0, 7) gs(f)
        WHERE len(embedding) >= 8
    ),
    stats AS (SELECT f, min(x) AS mn, max(x) AS mx FROM base GROUP BY f),
    binned0 AS (
        SELECT b.vec_id, b.y, b.f,
               CASE WHEN s.mx = s.mn THEN 0
                    ELSE least(CAST(floor((b.x - s.mn)
                                          / ((s.mx - s.mn) / 8.0))
                               AS INT), 7)
               END AS bin
        FROM base b JOIN stats s USING (f)
    ),
    -- vec_id is the vector identity: duplicate-keyed rows collapse to
    -- ONE vector per (vec_id, y, f) with the min bin, mirroring the
    -- engine's per_f collapse (ml/boost.py) so the duplicate semantics
    -- can never diverge between the two doors (round-6 advice)
    binned AS (
        SELECT vec_id, y, f, min(bin) AS bin FROM binned0 GROUP BY 1, 2, 3
    ),
    cand AS (
        SELECT fs.f, ts.t, ps.p
        FROM generate_series(0, 7) fs(f)
        CROSS JOIN generate_series(1, 7) ts(t)
        CROSS JOIN (VALUES (1), (-1)) ps(p)
    ),
    c1 AS (
        SELECT f, bin, y, CAST(count(*) AS BIGINT) AS sw
        FROM binned GROUP BY f, bin, y
    ),
    e1 AS (
        SELECT cand.f, cand.t, cand.p,
               sum(CASE WHEN (CASE WHEN cand.p = 1 THEN c.bin >= cand.t
                                   ELSE c.bin < cand.t END) <> (c.y = 1)
                        THEN c.sw ELSE 0 END) AS err
        FROM cand JOIN c1 c ON c.f = cand.f
        GROUP BY cand.f, cand.t, cand.p
    ),
    s1 AS (SELECT f, t, p, CAST(err AS BIGINT) AS err
           FROM e1 ORDER BY err, f, t, p LIMIT 1),
    p1 AS (
        SELECT b.vec_id, b.y,
               CASE WHEN (s.p = 1 AND b.bin >= s.t)
                      OR (s.p = -1 AND b.bin < s.t)
                    THEN 1 ELSE 0 END AS pp
        FROM binned b JOIN s1 s ON b.f = s.f
    ),
    m1 AS (SELECT vec_id, y, pp,
                  CASE WHEN pp <> y THEN 1 ELSE 0 END AS m FROM p1),
    acc1 AS (SELECT CAST(count(*) FILTER (WHERE pp = y) AS BIGINT)
                 AS n_correct FROM m1),
    c2 AS (
        SELECT b.f, b.bin, b.y,
               CAST(sum(CASE WHEN m1.m = 1 THEN 2 ELSE 1 END) AS BIGINT)
                   AS sw
        FROM binned b JOIN m1 ON m1.vec_id = b.vec_id
        GROUP BY b.f, b.bin, b.y
    ),
    e2 AS (
        SELECT cand.f, cand.t, cand.p,
               sum(CASE WHEN (CASE WHEN cand.p = 1 THEN c.bin >= cand.t
                                   ELSE c.bin < cand.t END) <> (c.y = 1)
                        THEN c.sw ELSE 0 END) AS err
        FROM cand JOIN c2 c ON c.f = cand.f
        GROUP BY cand.f, cand.t, cand.p
    ),
    s2 AS (SELECT f, t, p, CAST(err AS BIGINT) AS err
           FROM e2 ORDER BY err, f, t, p LIMIT 1),
    p2 AS (
        SELECT b.vec_id, b.y,
               CASE WHEN (s.p = 1 AND b.bin >= s.t)
                      OR (s.p = -1 AND b.bin < s.t)
                    THEN 1 ELSE 0 END AS pp
        FROM binned b JOIN s2 s ON b.f = s.f
    ),
    m2 AS (SELECT vec_id, y, pp,
                  CASE WHEN pp <> y THEN 1 ELSE 0 END AS m FROM p2),
    acc2 AS (
        SELECT CAST(count(*) FILTER (
                   WHERE (CASE WHEN (2 * a.pp - 1) + (2 * b.pp - 1) > 0
                               THEN 1 ELSE 0 END) = a.y) AS BIGINT)
            AS n_correct
        FROM p1 a JOIN p2 b USING (vec_id)
    ),
    c3 AS (
        SELECT b.f, b.bin, b.y,
               CAST(sum((CASE WHEN m1.m = 1 THEN 2 ELSE 1 END)
                        * (CASE WHEN m2.m = 1 THEN 2 ELSE 1 END))
                    AS BIGINT) AS sw
        FROM binned b
        JOIN m1 ON m1.vec_id = b.vec_id
        JOIN m2 ON m2.vec_id = b.vec_id
        GROUP BY b.f, b.bin, b.y
    ),
    e3 AS (
        SELECT cand.f, cand.t, cand.p,
               sum(CASE WHEN (CASE WHEN cand.p = 1 THEN c.bin >= cand.t
                                   ELSE c.bin < cand.t END) <> (c.y = 1)
                        THEN c.sw ELSE 0 END) AS err
        FROM cand JOIN c3 c ON c.f = cand.f
        GROUP BY cand.f, cand.t, cand.p
    ),
    s3 AS (SELECT f, t, p, CAST(err AS BIGINT) AS err
           FROM e3 ORDER BY err, f, t, p LIMIT 1),
    p3 AS (
        SELECT b.vec_id, b.y,
               CASE WHEN (s.p = 1 AND b.bin >= s.t)
                      OR (s.p = -1 AND b.bin < s.t)
                    THEN 1 ELSE 0 END AS pp
        FROM binned b JOIN s3 s ON b.f = s.f
    ),
    acc3 AS (
        SELECT CAST(count(*) FILTER (
                   WHERE (CASE WHEN (2 * a.pp - 1) + (2 * b.pp - 1)
                                    + (2 * c.pp - 1) > 0
                               THEN 1 ELSE 0 END) = a.y) AS BIGINT)
            AS n_correct
        FROM p1 a JOIN p2 b USING (vec_id) JOIN p3 c USING (vec_id)
    )
    SELECT CAST(1 AS INT) AS round, CAST(s1.f AS INT) AS feature,
           CAST(s1.t AS INT) AS thr_bin, CAST(s1.p AS INT) AS polarity,
           s1.err AS weighted_err, acc1.n_correct
    FROM s1 CROSS JOIN acc1
    UNION ALL
    SELECT CAST(2 AS INT), CAST(s2.f AS INT), CAST(s2.t AS INT),
           CAST(s2.p AS INT), s2.err, acc2.n_correct
    FROM s2 CROSS JOIN acc2
    UNION ALL
    SELECT CAST(3 AS INT), CAST(s3.f AS INT), CAST(s3.t AS INT),
           CAST(s3.p AS INT), s3.err, acc3.n_correct
    FROM s3 CROSS JOIN acc3
    ORDER BY round
"""


def _rproj_oracle_sql() -> str:
    """Mirror of ml/rproj.q_random_projection: the SAME driver-side sign
    matrix (rp_signs) baked in as literals, the SAME balanced-tree
    parenthesization for every float sum, the SAME division chain."""
    from lexam_data_pipeline_spark.ml.rproj import (
        RP_DIM,
        RP_K,
        RP_PAIR_STEP,
        rp_signs,
    )

    signs = rp_signs()
    x_cols = ",\n               ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(RP_DIM)
    )
    y_cols = ",\n               ".join(
        _balanced_sum_sql(
            [
                (f"x{i}" if signs[j][i] == 1 else f"(-x{i})")
                for i in range(RP_DIM)
            ]
        )
        + f" AS y{j}"
        for j in range(RP_K)
    )
    orig = _balanced_sum_sql(
        [f"((a.x{i} - b.x{i}) * (a.x{i} - b.x{i}))" for i in range(RP_DIM)]
    )
    proj = _balanced_sum_sql(
        [f"((a.y{j} - b.y{j}) * (a.y{j} - b.y{j}))" for j in range(RP_K)]
    )
    return f"""
    WITH base AS (
        SELECT vec_id,
               {x_cols}
        FROM embeddings WHERE len(embedding) >= {RP_DIM}
    ),
    proj AS (
        SELECT *,
               {y_cols}
        FROM base
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round({orig}, 6) AS orig_d2,
           round({proj}, 6) AS proj_d2,
           round({proj} / nullif({RP_K}.0 * {orig}, 0), 6) AS jl_ratio
    FROM proj a JOIN proj b ON b.vec_id = a.vec_id + {RP_PAIR_STEP}
    ORDER BY a_id LIMIT 50
"""


ML_ORACLES["q_random_projection"] = _rproj_oracle_sql()
