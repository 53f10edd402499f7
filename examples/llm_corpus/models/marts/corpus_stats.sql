-- Corpus accounting: the per-language mix the sampler downstream
-- consumes — doc counts, token/char budgets, source diversity, and
-- the seed-weighted token budget (lang_weights is a version-controlled
-- seed CSV: the sampling policy ships WITH the project, broadcast-sized
-- by contract). Unseeded languages weight to zero, loudly.
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT d.source) AS n_sources,
       CAST(sum(d.n_tokens) * max(coalesce(w.weight_pm, 0)) AS BIGINT)
         AS weighted_tokens_pm
FROM {{ ref('dedup_survivors') }} d
LEFT JOIN {{ ref('lang_weights') }} w ON d.lang = w.lang
GROUP BY d.lang
