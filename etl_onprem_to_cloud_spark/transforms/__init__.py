from .netflix import (
    EUROPE_COUNTRIES_STD,
    RATING_MEANING,
    VALID_RATINGS,
    clean_netflix_titles,
    genre_country_report,
)

__all__ = [
    "EUROPE_COUNTRIES_STD",
    "RATING_MEANING",
    "VALID_RATINGS",
    "clean_netflix_titles",
    "genre_country_report",
]
