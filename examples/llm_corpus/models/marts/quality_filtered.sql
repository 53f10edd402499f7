-- Quality gate: length floor, token floor, alpha ratio >= 0.5 — the
-- C4-style heuristics expressed as vars so a profile change is a
-- config edit, not a model edit. Integer math only (n_alpha * 2 >=
-- n_chars) keeps the predicate exact and pushdown-friendly.
SELECT doc_id, text, lang, source, n_chars, n_tokens
FROM {{ ref('stg_documents') }}
WHERE n_chars >= {{ var('min_chars') }}
  AND n_tokens >= {{ var('min_tokens') }}
  AND n_alpha * 2 >= n_chars
