SELECT column1, datetime
FROM {{ ref('rows_of_kind') }}('click')
