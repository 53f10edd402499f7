-- Exact dedup, keep-first: one survivor per md5(text), lowest doc_id
-- wins (deterministic tie-break). At 100 TB this is one shuffle on
-- the hash — the same plan the engine's dedup_exact operator uses.
SELECT doc_id, text, lang, source, n_chars, n_tokens
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM {{ ref('quality_filtered') }}
)
WHERE rn = 1
