"""Ring A parity: the netflix_titles clean, re-expressed natively.

Reproduces the full semantics of reference etl/transform.py:27-200 (the
engine's behavioral contract) with one structural change: the reference's
row-at-a-time Python UDF ``get_europe_country`` (etl/transform.py:73-89)
is rewritten as higher-order array functions over a map literal.  That
keeps the whole plan inside WholeStageCodegen (no JVM<->Python pickling
per row) and lets the later filters (etl/transform.py:92,102,200) push
past it -- the single biggest perf fix at scale (SURVEY.md section 4).

Semantics preserved exactly, including order sensitivity: the UDF returns
the standardized name of the FIRST country (in string order, not map
order) that appears in the Europe map, else NULL.  ``F.filter`` over the
split array preserves element order, so ``F.get(matches, 0)`` is the
faithful equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Europe standardization map (reference etl/transform.py:41-71).
EUROPE_COUNTRIES_STD: dict[str, str] = {
    "United Kingdom": "United Kingdom",
    "England": "United Kingdom",
    "Scotland": "United Kingdom",
    "Wales": "United Kingdom",
    "Ireland": "Ireland",
    "Spain": "Spain",
    "France": "France",
    "Germany": "Germany",
    "West Germany": "Germany",
    "Italy": "Italy",
    "Portugal": "Portugal",
    "Netherlands": "Netherlands",
    "Belgium": "Belgium",
    "Sweden": "Sweden",
    "Norway": "Norway",
    "Denmark": "Denmark",
    "Finland": "Finland",
    "Poland": "Poland",
    "Czech Republic": "Czech Republic",
    "Austria": "Austria",
    "Switzerland": "Switzerland",
    "Luxembourg": "Luxembourg",
    "Russia": "Russia",
    "Ukraine": "Ukraine",
    "Belarus": "Belarus",
    "Turkey": "Turkey",
    "Greece": "Greece",
    "Cyprus": "Cyprus",
    "Iceland": "Iceland",
}

# Rating whitelist (reference etl/transform.py:108-112).
VALID_RATINGS: list[str] = [
    "TV-G", "TV-Y", "TV-Y7", "TV-Y7-FV",
    "TV-PG", "TV-14", "TV-MA",
    "G", "PG", "PG-13", "R", "NC-17", "NR",
]

# rating -> Spanish meaning (reference etl/transform.py:121-137).
RATING_MEANING: dict[str, str] = {
    "TV-G": "Todo público",
    "TV-Y": "Niños pequeños",
    "TV-Y7": "Mayores de 7 años",
    "TV-Y7-FV": "7+ con violencia fantasiosa",
    "TV-PG": "Guía parental recomendada",
    "TV-14": "Mayores de 14 años",
    "TV-MA": "Solo adultos",
    "G": "Todo público",
    "PG": "Guía parental",
    "PG-13": "Mayores de 13 años",
    "R": "Restringido +17",
    "NC-17": "Solo adultos (estricto)",
    "NR": "No clasificado",
}

# Ordered LIKE-pattern -> group chain (reference etl/transform.py:149-164;
# order matters: e.g. "Kids' TV Drama" must resolve to Kids, not Drama).
GENRE_GROUPS: list[tuple[str, str]] = [
    ("%Kids%", "Kids"),
    ("%Anime%", "Anime"),
    ("%Crime%", "Crime"),
    ("%Horror%", "Crime"),
    ("%Action%", "Crime"),
    ("%Drama%", "Drama"),
    ("%Romantic%", "Drama"),
    ("%Classic%", "Drama"),
    ("%Comedy%", "Comedy"),
    ("%Stand-Up%", "Comedy"),
    ("%Reality%", "Documental"),
    ("%Docu%", "Documental"),
]


def _map_literal(d: dict[str, str]) -> Column:
    return F.create_map(*[F.lit(x) for pair in d.items() for x in pair])


def europe_country(country: Column) -> Column:
    """Native rewrite of the reference Python UDF (etl/transform.py:73-83).

    strip quotes -> split on ',' -> trim parts -> drop empties -> first
    part present in the map -> standardized name; NULL when none match or
    input is NULL/empty.  All codegen'd; no Python worker round-trip.
    """
    eu = _map_literal(EUROPE_COUNTRIES_STD)
    cleaned = F.regexp_replace(country, '"', "")
    parts = F.filter(
        F.transform(F.split(cleaned, ","), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    matches = F.filter(parts, lambda p: F.try_element_at(eu, p).isNotNull())
    return F.try_element_at(eu, F.get(matches, 0))


def clean_netflix_titles(df: DataFrame) -> DataFrame:
    """Full clean: reference etl/transform.py:27-200, one declarative plan.

    Output schema = schemas.NETFLIX_CLEAN (8 columns,
    reference etl/transform.py:188-197).
    """
    valid = F.lit(VALID_RATINGS)
    meaning_map = _map_literal(RATING_MEANING)

    # Step 3 (ref :27): TV Shows only -- sits directly on the scan so
    # Catalyst pushes it into the source.
    out = df.filter(F.col("type") == "TV Show")

    # Step 4 (ref :32-35): first listed genre.
    main_genre = F.split(F.col("listed_in"), ",").getItem(0)

    # Step 5 (ref :86-92): standardized EU country, non-EU rows dropped.
    country_base = F.trim(F.regexp_replace(F.col("country"), '"', ""))
    out = (
        out.withColumns(
            {
                "main_genre": main_genre,
                "country": country_base,
                "country_eu": europe_country(country_base),
            }
        )
        .filter(F.col("country_eu").isNotNull())
    )

    # Step 6 (ref :97-103): digits-only year, empty dropped, cast int.
    # try_cast mirrors the reference's non-ANSI cast-to-null on overflow.
    year_digits = F.regexp_replace(F.col("release_year"), "[^0-9]", "")
    out = (
        out.withColumn("release_year", year_digits)
        .filter(F.col("release_year") != "")
        .withColumn("release_year", F.col("release_year").try_cast("int"))
    )

    # Step 7 (ref :108-144): whitelist rating + meaning.  The reference's
    # 13-branch when-chain plus its re-guard collapse to one map lookup
    # with a coalesce default (identical output for every input class).
    rating_clean = F.when(
        F.col("rating").isin(VALID_RATINGS), F.col("rating")
    ).otherwise("UNKNOWN")
    out = out.withColumn("rating_clean", rating_clean).withColumn(
        "rating_meaning",
        F.when(
            F.col("rating_clean").isin(VALID_RATINGS),
            F.coalesce(
                F.try_element_at(meaning_map, F.col("rating_clean")),
                F.lit("Desconocido"),
            ),
        ).otherwise("Desconocido"),
    )

    # Step 8 (ref :149-164): ordered LIKE chain -> genre_group.
    genre_group = None
    for pat, grp in GENRE_GROUPS:
        cond = F.col("main_genre").like(pat)
        genre_group = (
            F.when(cond, grp) if genre_group is None else genre_group.when(cond, grp)
        )
    out = out.withColumn("genre_group", genre_group.otherwise("Other"))

    # Step 9 (ref :171-183): strip quotes from text columns; the
    # reference also rewrites ',' -> ' -' in titles purely to survive its
    # downstream CSV export (ref :176-177) -- kept for output parity.
    out = out.withColumns(
        {
            c: F.regexp_replace(F.col(c), '"', "")
            for c in ["title", "country", "country_eu", "main_genre", "rating_meaning"]
        }
    )
    out = out.withColumns(
        {
            "title": F.trim(F.regexp_replace(F.col("title"), ",", " -")),
            "rating_meaning": F.trim(F.col("rating_meaning")),
            "main_genre": F.trim(F.col("main_genre")),
            "country_eu": F.trim(F.col("country_eu")),
        }
    )

    # Step 10 (ref :188-200): final projection + garbage guard.
    return out.select(
        F.col("show_id"),
        F.col("title"),
        F.col("country_eu").alias("country"),
        F.col("release_year"),
        F.col("rating_clean").alias("rating"),
        F.col("rating_meaning"),
        F.col("main_genre"),
        F.col("genre_group"),
    ).filter(~F.col("rating_meaning").isin("TV-MA", "TV-G", "2020"))


def genre_country_report(clean: DataFrame) -> DataFrame:
    """The aggregation the pipeline exists to feed: the reference ships
    its output to Athena/QuickSight for exactly this kind of dashboard
    rollup (reference README.md:184-248).  Native here."""
    return (
        clean.groupBy("genre_group", "country")
        .agg(F.count(F.lit(1)).alias("n_titles"))
        .orderBy(F.col("n_titles").desc(), "genre_group", "country")
    )
