"""Locale validation.

Reference: meilisearch-types/src/locales.rs — the `locales` search/facet
parameter and `localizedAttributes` setting accept ISO-639-1/639-3 codes
(plus `cmn`); unknown values error with the sorted list of valid locales.
"""

from __future__ import annotations

from typing import Iterable, Optional

from .errors import EngineError, ErrorCode

VALID_LOCALES = frozenset(
    "af afr ak aka am amh ar ara az aze be bel bn ben bg bul ca cat cs ces"
    " da dan de deu el ell en eng eo epo et est fi fin fr fra gu guj he heb"
    " hi hin hr hrv hu hun hy hye id ind it ita jv jav ja jpn kn kan ka kat"
    " km khm ko kor la lat lv lav lt lit ml mal mr mar mk mkd my mya ne nep"
    " nl nld nb nob or ori pa pan fa pes pl pol pt por ro ron ru rus si sin"
    " sk slk sl slv sn sna es spa sr srp sv swe ta tam te tel tl tgl th tha"
    " tk tuk tr tur uk ukr ur urd uz uzb vi vie yi yid zh zho zu zul cmn".split()
)


def _format_error(invalid: str) -> str:
    ordered = sorted(VALID_LOCALES, key=lambda l: (len(l), l))
    return (
        f"Unsupported locale `{invalid}`, expected one of {', '.join(ordered)}"
    )


def validate_locales(
    locales: Optional[Iterable],
    code: ErrorCode = ErrorCode.INVALID_SEARCH_LOCALES,
    field: str = ".locales",
) -> Optional[list[str]]:
    if locales is None:
        return None
    if not isinstance(locales, (list, tuple)):
        raise EngineError(
            code,
            f"Invalid value type at `{field}`: expected an array of locale"
            " strings.",
        )
    out = []
    for loc in locales:
        if not isinstance(loc, str) or loc not in VALID_LOCALES:
            raise EngineError(
                code, f"Invalid value at `{field}`: {_format_error(str(loc))}"
            )
        out.append(loc)
    return out
