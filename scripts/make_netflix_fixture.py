"""Generate the committed netflix_titles CSV fixture.

Deterministic (no randomness): 14 hand-written rows covering every
dirty-data class the reference transform defends against
(FIXTURES.md section A, reference etl/transform.py:27-200) plus a
cycled matrix of countries x ratings x genres x dirty years, so the
driver's sf-independent q_netflix_* correctness rows exercise each
CASE branch with more than one row.

Run from the repo root: python scripts/make_netflix_fixture.py
"""

from __future__ import annotations

import csv
import pathlib

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "etl_onprem_to_cloud_spark"
    / "data"
    / "netflix_titles_fixture.csv"
)

HEADER = [
    "show_id", "type", "title", "director", "cast", "country",
    "date_added", "release_year", "rating", "duration", "listed_in",
    "description",
]

# The 14 dirty-class rows (mirrors tests/test_netflix_transform.py).
HAND_ROWS = [
    ("s1", "TV Show", "Plain Show", "", "", "France", "Jan 1, 2020", "2020",
     "TV-MA", "2 Seasons", "Crime TV Shows, Drama", "x"),
    ("s2", "Movie", "A Movie", "", "", "France", "", "2019", "PG", "90 min",
     "Drama", "x"),
    ("s3", "TV Show", "Brit Show", "", "", "England", "", "2019", "TV-G",
     "1 Season", "British TV Shows", "x"),
    ("s4", "TV Show", "Multi Country", "", "", "United States, Spain, France",
     "", "2018", "TV-14", "1 Season", "Kids' TV", "x"),
    ("s5", "TV Show", "Quoted Country", "", "", '"  West Germany , Italy "',
     "", "2017", "R", "1 Season", "Anime Series", "x"),
    ("s6", "TV Show", "Non EU", "", "", "Japan, South Korea", "", "2016",
     "TV-PG", "1 Season", "Anime Series", "x"),
    ("s7", "TV Show", "No Country", "", "", None, "", "2015", "NR",
     "1 Season", "Reality TV", "x"),
    ("s8", "TV Show", "Dirty Year", "", "", "Italy", "", " 2014a ", "TV-Y",
     "1 Season", "Docuseries", "x"),
    ("s9", "TV Show", "No Year", "", "", "Italy", "", "abc", "TV-Y7",
     "1 Season", "Horror TV", "x"),
    ("s10", "TV Show", "Weird Rating", "", "", "Poland", "", "2013",
     "74 min", "1 Season", "Action TV", "x"),
    ("s11", "TV Show", '  "Hello, World", Again  ', "", "", "Sweden", "",
     "2012", "TV-MA", "1 Season", "Stand-Up Comedy", "x"),
    ("s12", "TV Show", "Odd Genre", "", "", "Norway", "", "2011", "NC-17",
     "1 Season", "Telenovelas", "x"),
    ("s13", "TV Show", "Kids Drama", "", "", "Greece", "", "2010", "G",
     "1 Season", "Kids' TV Drama", "x"),
    ("s14", "TV Show", "Empty Country", "", "", "", "", "2009", "PG-13",
     "1 Season", "Classic TV", "x"),
]

COUNTRIES = [
    "France", "England", "United States, Spain", "Japan", "",
    "West Germany", "Italy, France", "Scotland", "United States",
    "Norway, Japan", '"  Sweden , Poland "', "South Korea", "Ukraine",
    "Turkey", "Brazil, Portugal", "Iceland", "Czech Republic", "Wales",
]
RATINGS = [
    "TV-G", "TV-Y", "TV-Y7", "TV-Y7-FV", "TV-PG", "TV-14", "TV-MA",
    "G", "PG", "PG-13", "R", "NC-17", "NR", "74 min", "INVALID", "",
]
GENRES = [
    "Crime TV Shows, International", "Kids' TV", "Anime Series",
    "British TV Shows", "Docuseries", "Reality TV", "Romantic TV Shows",
    "Classic TV", "Stand-Up Comedy, Talk", "Horror TV", "Action TV",
    "Telenovelas", "Science TV", "Kids' TV Drama", "Spanish Dramas",
]
YEARS = ["2020", "2019 ", " 2018a", "abc", "1999", "20x5", "", "2001"]


def matrix_rows():
    for i in range(120):
        sid = f"m{i}"
        typ = "Movie" if i % 7 == 3 else "TV Show"
        if i % 5 == 0:
            title = f'  "Show, {i}" extra  '
        elif i % 5 == 2:
            title = f"Comma, Title {i}"
        else:
            title = f"Matrix Show {i}"
        yield (
            sid, typ, title, "", "",
            COUNTRIES[i % len(COUNTRIES)],
            "Jan 1, 2020" if i % 4 == 0 else "",
            YEARS[i % len(YEARS)],
            RATINGS[i % len(RATINGS)],
            f"{1 + i % 4} Seasons",
            GENRES[i % len(GENRES)],
            f"desc {i}",
        )


def main() -> None:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with OUT.open("w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(HEADER)
        for row in HAND_ROWS:
            w.writerow(["" if v is None else v for v in row])
        for row in matrix_rows():
            w.writerow(row)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
