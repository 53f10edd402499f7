-- Staging view: raw documents plus the two per-doc features every
-- downstream gate needs. Single-space tokenization is the corpus's
-- own convention (text is space-joined); the alpha count feeds an
-- integer-math ratio test downstream (no float thresholds in gates).
SELECT doc_id,
       text,
       lang,
       source,
       n_chars,
       size(split(text, ' ')) AS n_tokens,
       length(regexp_replace(text, '[^a-zA-Z]', '')) AS n_alpha
FROM {{ source('src', 'documents') }}
