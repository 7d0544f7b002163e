"""F2/F5 — bounded date grammar (SURVEY.md §2.8 F2, §7.4.3).

The reference delegates date recognition to
``Microsoft.Recognizers.Text.DateTime`` (``NameRecognizer/
EntityRecognizer.cs:12-27``) and takes the *first* recognized expression's
surface text.  That library is open-ended; per SURVEY.md §7.4.3 we freeze a
bounded, documented grammar and generate fixtures only inside it.

Frozen grammar (first match in left-to-right scan wins, mirroring the
recognizer's "first result" choice at ``EntityRecognizer.cs:20-25``):

  D1  numeric dates   ``MM/DD/YYYY`` ``M/D/YYYY`` ``MM-DD-YYYY``
                      (separators ``/`` or ``-``, years 1900-2099)
  D2  month-name      ``March 5, 1975`` ``MAR 5 1975`` ``January 02, 2020``
                      (full or 3-letter month, optional comma, optional
                      ordinal suffix on the day)
  D3  ISO-8601 date   ``2020-09-23``
  D4  day-first       ``5 March 1975`` ``23rd Sep, 2020``

The surface text of the match is returned verbatim (the caller uppercases
for the invoice path, matching ``Model/InvoiceDate.cs:20`` ``.ToUpper()``).
"""

from __future__ import annotations

import re

_MONTHS = (
    "JANUARY|FEBRUARY|MARCH|APRIL|MAY|JUNE|JULY|AUGUST|SEPTEMBER|OCTOBER|"
    "NOVEMBER|DECEMBER|JAN|FEB|MAR|APR|JUN|JUL|AUG|SEP|SEPT|OCT|NOV|DEC"
)

D1_NUMERIC = r"\b(0?[1-9]|1[0-2])[/-](0?[1-9]|[12][0-9]|3[01])[/-]((19|20)[0-9]{2})\b"
D2_MONTHNAME = (
    r"\b(" + _MONTHS + r")\.?\s+(0?[1-9]|[12][0-9]|3[01])(?:ST|ND|RD|TH)?,?\s+((19|20)[0-9]{2})\b"
)

D3_ISO = r"\b((19|20)[0-9]{2})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])\b"
D4_DAYFIRST = (
    r"\b(0?[1-9]|[12][0-9]|3[01])(?:ST|ND|RD|TH)?\s+(" + _MONTHS + r")\.?,?\s+((19|20)[0-9]{2})\b"
)

_ALL = [D1_NUMERIC, D2_MONTHNAME, D3_ISO, D4_DAYFIRST]
DATE_RE = re.compile("|".join(f"(?:{p})" for p in _ALL), re.IGNORECASE)

# Same grammar as a single RE2/Java-safe pattern for SQL engines (Spark
# `regexp_extract` group 0 / DuckDB `regexp_extract`). No lookarounds.
DATE_RE_SQL = "|".join(f"(?:{p})" for p in _ALL)


def find_first_date(text: str) -> tuple[str, int, int] | None:
    """Return (surface, start, end) of the first date in ``text`` or None."""
    m = DATE_RE.search(text)
    if m is None:
        return None
    return m.group(0), m.start(), m.end()


def recognize_date(text: str) -> str:
    """First date's surface text, or "" — the ``RecognizeDate`` analog
    (``NameRecognizer/EntityRecognizer.cs:12-27``)."""
    m = DATE_RE.search(text)
    return m.group(0) if m else ""
