"""P1 — special-character strip (SURVEY.md §2.3 P1).

Reference semantics: ``Regex.Replace(str, @"[^\\w\\s(#\\-@&$:\\/.,|)]", "",
IgnoreCase).TrimEnd()`` applied to every OCR word and line
(``TextExtraction/FilterData.cs:12-15``; call sites ``Worker.cs:167,179,218``).

Dialect deltas (frozen here, per SURVEY.md §7.4.2): .NET ``\\w`` and Python
``re`` ``\\w`` agree on ASCII + underscore and both are Unicode-aware;
``TrimEnd()`` with no args trims Unicode whitespace like ``str.rstrip()``.
We pin the *Python* behavior as the oracle truth.
"""

from __future__ import annotations

import re

# Keep chars: word chars, whitespace, and ( # - @ & $ : / . , | )
SPECIAL_CHARS = re.compile(r"[^\w\s(#\-@&$:\/.,|)]")

# The same pattern in Spark SQL / DuckDB dialect (RE2/Java compatible —
# no lookarounds needed here).
SPECIAL_CHARS_SQL = r"[^\w\s(#\-@&$:\/.,|)]"


def remove_special_characters(s: str) -> str:
    """Drop characters outside the keep-set, then right-trim whitespace."""
    return SPECIAL_CHARS.sub("", s).rstrip()
