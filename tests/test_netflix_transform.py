"""Ring A parity: clean_netflix_titles must reproduce the reference
transform's semantics (reference etl/transform.py:27-200) on a fixture
covering every dirty-data class the reference defends against
(FIXTURES.md section A), while keeping the plan free of Python UDFs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_onprem_to_cloud_spark.plans import has_python_udf
from etl_onprem_to_cloud_spark.schemas import NETFLIX_CLEAN, NETFLIX_TITLES
from etl_onprem_to_cloud_spark.transforms import (
    clean_netflix_titles,
    genre_country_report,
)

# One row per dirty-data class; columns:
# show_id, type, title, director, cast, country, date_added,
# release_year, rating, duration, listed_in, description
ROWS = [
    # clean TV Show, single EU country
    ("s1", "TV Show", "Plain Show", "", "", "France", "Jan 1, 2020", "2020",
     "TV-MA", "2 Seasons", "Crime TV Shows, Drama", "x"),
    # Movie -> dropped by F1
    ("s2", "Movie", "A Movie", "", "", "France", "", "2019", "PG", "90 min",
     "Drama", "x"),
    # England -> United Kingdom (synonym standardization)
    ("s3", "TV Show", "Brit Show", "", "", "England", "", "2019", "TV-G",
     "1 Season", "British TV Shows", "x"),
    # multi-country: first EU match wins (US listed first -> skip to Spain)
    ("s4", "TV Show", "Multi Country", "", "", "United States, Spain, France",
     "", "2018", "TV-14", "1 Season", "Kids' TV", "x"),
    # quoted country with spaces
    ("s5", "TV Show", "Quoted Country", "", "", '"  West Germany , Italy "',
     "", "2017", "R", "1 Season", "Anime Series", "x"),
    # non-EU only -> dropped by F2
    ("s6", "TV Show", "Non EU", "", "", "Japan, South Korea", "", "2016",
     "TV-PG", "1 Season", "Anime Series", "x"),
    # NULL country -> dropped
    ("s7", "TV Show", "No Country", "", "", None, "", "2015", "NR",
     "1 Season", "Reality TV", "x"),
    # dirty year with letters -> digits kept
    ("s8", "TV Show", "Dirty Year", "", "", "Italy", "", " 2014a ", "TV-Y",
     "1 Season", "Docuseries", "x"),
    # all-garbage year -> dropped by F3
    ("s9", "TV Show", "No Year", "", "", "Italy", "", "abc", "TV-Y7",
     "1 Season", "Horror TV", "x"),
    # invalid rating -> UNKNOWN / Desconocido
    ("s10", "TV Show", "Weird Rating", "", "", "Poland", "", "2013",
     "74 min", "1 Season", "Action TV", "x"),
    # title with commas, quotes, outer spaces
    ("s11", "TV Show", '  "Hello, World", Again  ', "", "", "Sweden", "",
     "2012", "TV-MA", "1 Season", "Stand-Up Comedy", "x"),
    # unmatched genre -> Other
    ("s12", "TV Show", "Odd Genre", "", "", "Norway", "", "2011", "NC-17",
     "1 Season", "Telenovelas", "x"),
    # genre order sensitivity: Kids beats Drama (first LIKE match wins)
    ("s13", "TV Show", "Kids Drama", "", "", "Greece", "", "2010", "G",
     "1 Season", "Kids' TV Drama", "x"),
    # empty-string country -> NULL country_eu -> dropped
    ("s14", "TV Show", "Empty Country", "", "", "", "", "2009", "PG-13",
     "1 Season", "Classic TV", "x"),
]


@pytest.fixture(scope="module")
def clean(spark):
    raw = spark.createDataFrame(ROWS, schema=NETFLIX_TITLES)
    return clean_netflix_titles(raw)


@pytest.fixture(scope="module")
def by_id(clean):
    return {r["show_id"]: r.asDict() for r in clean.collect()}


def test_output_schema(clean):
    # simpleString comparison: nullability flags differ between a
    # declared schema and a derived plan, the shape is what matters.
    assert clean.schema.simpleString() == NETFLIX_CLEAN.simpleString()


def test_no_python_udf_in_plan(clean):
    # The reference's get_europe_country UDF (etl/transform.py:73-89)
    # must be gone: that's the codegen-break fix.
    assert not has_python_udf(clean)


def test_dropped_rows(by_id):
    # movie, non-EU, null country, empty country, garbage year
    for sid in ["s2", "s6", "s7", "s9", "s14"]:
        assert sid not in by_id, f"{sid} should be dropped"
    assert set(by_id) == {"s1", "s3", "s4", "s5", "s8", "s10", "s11", "s12", "s13"}


def test_country_standardization(by_id):
    assert by_id["s1"]["country"] == "France"
    assert by_id["s3"]["country"] == "United Kingdom"  # England synonym
    assert by_id["s4"]["country"] == "Spain"  # first EU in string order
    assert by_id["s5"]["country"] == "Germany"  # quoted "West Germany"


def test_year_cleaning(by_id):
    assert by_id["s8"]["release_year"] == 2014
    assert isinstance(by_id["s1"]["release_year"], int)


def test_rating_whitelist_and_meaning(by_id):
    assert by_id["s1"]["rating"] == "TV-MA"
    assert by_id["s1"]["rating_meaning"] == "Solo adultos"
    assert by_id["s10"]["rating"] == "UNKNOWN"
    assert by_id["s10"]["rating_meaning"] == "Desconocido"
    assert by_id["s3"]["rating_meaning"] == "Todo público"


def test_title_cleanup(by_id):
    # quotes stripped, commas -> ' -', outer spaces trimmed
    # (reference etl/transform.py:171-180)
    assert by_id["s11"]["title"] == "Hello - World - Again"


def test_genre_grouping(by_id):
    assert by_id["s1"]["genre_group"] == "Crime"
    assert by_id["s11"]["genre_group"] == "Comedy"  # Stand-Up
    assert by_id["s12"]["genre_group"] == "Other"
    assert by_id["s13"]["genre_group"] == "Kids"  # order: Kids before Drama
    assert by_id["s8"]["genre_group"] == "Documental"  # Docu pattern
    assert by_id["s1"]["main_genre"] == "Crime TV Shows"  # split[0]


def test_report_aggregation(clean):
    rep = genre_country_report(clean).collect()
    assert rep[0]["n_titles"] >= 1
    total = sum(r["n_titles"] for r in rep)
    assert total == clean.count()
