r"""Java/Spark-equivalent lowercase as a DuckDB SQL expression.

The engine's ``lower()`` (Spark → the JDK's Unicode FULL default case
mapping) and the oracle's ``lower()`` (DuckDB → utf8proc SIMPLE mapping,
older Unicode tables) disagree in three ways, all invisible on an
ASCII-ish corpus (found by the r14 cross-engine casing audit, the same
divergence family as the ``\z`` line-terminator fix):

1. **71 unconditional mappings** DuckDB misses or maps differently
   (newer-Unicode letters: U+1C89, Latin Extended-D additions, Vithkuqi
   and Garay astral blocks), one of which — U+0130 ``İ`` — expands to
   TWO characters (``i`` + combining dot above).
2. **The final-sigma context rule**: Java lowers an UPPERCASE ``Σ`` to
   ``ς`` when preceded by a cased character and not followed by one,
   treating Case_Ignorable characters (combining marks, apostrophe,
   FULL STOP, colon, middle dot, …) as transparent on both sides.
   Pre-existing lowercase ``σ`` is never rewritten.
3. **Category-table skew**: RE2 (DuckDB's regex engine) lags the JDK's
   Unicode version, so ``\p{Ll}``-style classes under-cover the very
   characters from (1); the frozen delta strings patch the classes.

:func:`jlower_sql` builds the equivalent DuckDB expression:
``lower(replace(translate(<sigma-rule>(x), FROM, TO), 'İ', 'i̇'))`` where
the sigma rule runs on the ORIGINAL text (neighbors still carry case, and
only uppercase Σ is targeted) using capture groups — RE2 has no
lookarounds — and \p classes extended with the empirically-derived
deltas. All tables in ``_casing_tables.py`` are derived from the engines
themselves by ``tools/gen_jlower.py`` ("cased" = inserting the char
before a final Σ makes Spark emit ς; the RE2 side is what DuckDB's own
``regexp_matches`` reports) and the generator verifies ZERO mismatches
against Spark over an 8k-text adversarial corpus before freezing.

Known residual gap, frozen in ``IGN_MINUS`` (one char, U+1171E, an Ahom
mark): RE2 classifies it inside ``\p{M}`` but the engine does not treat
it as case-ignorable, and RE2 classes cannot subtract — sigma adjacent to
that single character may still diverge. Documented rather than patched:
a class-subtraction emulation would cost more complexity than the edge is
worth, and `tests/test_casing.py` pins the rest of the surface.
"""

from __future__ import annotations


def _cls_escape(s: str) -> str:
    """Escape regex character-class metacharacters in a literal char run."""
    return "".join("\\" + c if c in "\\^]-[" else c for c in s)


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def jlower_sql(col: str, tables: dict | None = None) -> str:
    """DuckDB SQL expression computing Spark/Java ``lower(col)``.

    ``tables`` overrides the frozen tables (used by the generator to
    verify candidate tables before freezing them — which is also why the
    tables module is imported lazily: the generator must be able to load
    this module before the frozen file exists).
    """
    if tables is None:
        # explicit None check (ADVICE r14): `tables or {...}` would take
        # the fallback branch on a passed-but-falsy dict too, hitting an
        # unbound _T; a caller-supplied dict is used as-is and validated
        from . import _casing_tables as _T

        t = {
            "TRANSLATE_FROM": _T.TRANSLATE_FROM,
            "TRANSLATE_TO": _T.TRANSLATE_TO,
            "CASED_PLUS": _T.CASED_PLUS,
            "IGN_PLUS": _T.IGN_PLUS,
            "IGN_MINUS": _T.IGN_MINUS,
        }
    else:
        missing = {
            "TRANSLATE_FROM",
            "TRANSLATE_TO",
            "CASED_PLUS",
            "IGN_PLUS",
            "IGN_MINUS",
        } - tables.keys()
        if missing:
            raise ValueError(f"tables missing keys: {sorted(missing)}")
        t = tables
    cased = r"\p{Ll}\p{Lu}\p{Lt}" + _cls_escape(t["CASED_PLUS"])
    ign = r"\p{Mn}\p{Me}\p{Cf}\p{Lm}\p{Sk}" + _cls_escape(t["IGN_PLUS"])
    pat = f"([{cased}][{ign}]*)Σ([{ign}]*)($|[^{cased}{ign}])"
    sigma = (
        f"regexp_replace({col}, '{_sql_quote(pat)}', " + r"'\1ς\2\3', 'g')"
    )
    return (
        f"lower(replace(translate({sigma}, "
        f"'{_sql_quote(t['TRANSLATE_FROM'])}', "
        f"'{_sql_quote(t['TRANSLATE_TO'])}'), 'İ', 'i̇'))"
    )
