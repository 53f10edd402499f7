-- Corpus accounting: the per-language mix the sampler downstream
-- consumes — doc counts, token/char budgets, source diversity.
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT source) AS n_sources
FROM {{ ref('dedup_survivors') }}
GROUP BY lang
