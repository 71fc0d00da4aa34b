"""Ring A end-to-end as driver-checked registry entries: the reference
pipeline's actual behavior (extract CSV -> clean -> report,
reference etl/transform.py:27-200 and the README.md:241-248 dashboard
aggregation) run against a committed CSV fixture, with a full DuckDB
SQL twin of every cleaning step.

The oracle SQL is BUILT from the same constant tables
(transforms/netflix.py EUROPE_COUNTRIES_STD / VALID_RATINGS /
RATING_MEANING / GENRE_GROUPS) the Spark transform uses, so the two
can never drift apart silently.  Both engines read the same RFC-4180
CSV (Spark with escape='"', DuckDB natively); empty fields are written
unquoted so both sides read them as NULL.
"""

from __future__ import annotations

import pathlib

from ..sources.io import read_csv
from ..schemas import NETFLIX_TITLES
from ..transforms.netflix import (
    EUROPE_COUNTRIES_STD,
    GENRE_GROUPS,
    RATING_MEANING,
    VALID_RATINGS,
    clean_netflix_titles,
    genre_country_report,
)
from . import query

FIXTURE_CSV = str(
    pathlib.Path(__file__).resolve().parent.parent
    / "data"
    / "netflix_titles_fixture.csv"
)

# -- DuckDB twins of the transform's constant lookups ---------------------

_EU_CASE = "CASE x " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in EUROPE_COUNTRIES_STD.items()
) + " ELSE NULL END"

_VALID_IN = ", ".join(f"'{r}'" for r in VALID_RATINGS)

_MEANING_CASE = "CASE rating_clean " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in RATING_MEANING.items()
) + " ELSE 'Desconocido' END"

_GENRE_CASE = "CASE " + " ".join(
    f"WHEN main_genre LIKE '{pat}' THEN '{grp}'" for pat, grp in GENRE_GROUPS
) + " ELSE 'Other' END"

# Full clean as one DuckDB CTE chain (reference etl/transform.py:27-200,
# step numbers in comments match transforms/netflix.py).
_CLEAN_SQL = f"""
WITH raw AS (
  SELECT * FROM read_csv('{FIXTURE_CSV}', header=true, all_varchar=true)
),
tv AS (  -- step 3: TV Shows only
  SELECT * FROM raw WHERE type = 'TV Show'
),
std AS (  -- steps 4-5: first genre; quote-stripped trimmed country
  SELECT show_id, title, rating, release_year,
    string_split(listed_in, ',')[1] AS main_genre,
    trim(replace(country, '"', '')) AS country_base
  FROM tv
),
eu AS (  -- step 5: first EU country in string order, else NULL -> drop
  SELECT *,
    list_filter(
      list_transform(
        list_filter(
          list_transform(string_split(country_base, ','), x -> trim(x)),
          x -> x <> ''),
        x -> {_EU_CASE}),
      x -> x IS NOT NULL)[1] AS country_eu
  FROM std
  WHERE country_eu IS NOT NULL
),
yr AS (  -- step 6: digits-only year, empty dropped, cast int
  SELECT *, regexp_replace(release_year, '[^0-9]', '', 'g') AS year_digits
  FROM eu
  WHERE year_digits <> ''
),
rated AS (  -- step 7: whitelist rating + Spanish meaning
  SELECT *,
    CASE WHEN rating IN ({_VALID_IN}) THEN rating ELSE 'UNKNOWN' END
      AS rating_clean
  FROM yr
),
grouped AS (  -- step 8: ordered LIKE chain -> genre_group
  SELECT *, {_MEANING_CASE} AS rating_meaning, {_GENRE_CASE} AS genre_group
  FROM rated
)
SELECT show_id,
  trim(replace(replace(title, '"', ''), ',', ' -')) AS title,
  country_eu AS country,
  TRY_CAST(year_digits AS INTEGER) AS release_year,
  rating_clean AS rating,
  rating_meaning,
  trim(replace(main_genre, '"', '')) AS main_genre,
  genre_group
FROM grouped
WHERE rating_meaning NOT IN ('TV-MA', 'TV-G', '2020')
"""


def _clean_df(spark):
    raw = read_csv(spark, FIXTURE_CSV, NETFLIX_TITLES)
    return clean_netflix_titles(raw)


@query(
    "q_netflix_clean",
    oracle=_CLEAN_SQL,
    tags=("netflix", "ring-a", "csv", "pipeline"),
    description="Reference pipeline end-to-end (etl/transform.py:27-200): "
    "CSV scan with declared schema -> native clean (country "
    "standardization, year repair, rating whitelist, genre grouping, "
    "title cleanup) -> the reference's 8-column output, DuckDB-oracled "
    "step for step over a committed dirty-data fixture.",
)
def q_netflix_clean(spark, sf_dir):
    # sf_dir intentionally unused: Ring A's input is the reference's CSV
    # shape, not the TPC-H fixtures.
    return _clean_df(spark)


@query(
    "q_netflix_report",
    oracle=f"""
WITH clean AS ({_CLEAN_SQL})
SELECT genre_group, country, count(*) AS n_titles
FROM clean
GROUP BY genre_group, country
ORDER BY n_titles DESC, genre_group, country
""",
    tags=("netflix", "ring-a", "agg", "pipeline"),
    description="The dashboard rollup the reference ships to "
    "Athena/QuickSight (reference README.md:184-248): titles per "
    "(genre_group, country) over the cleaned output, made native.",
)
def q_netflix_report(spark, sf_dir):
    return genre_country_report(_clean_df(spark))
