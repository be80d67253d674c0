"""Query library.

- :mod:`api_logs` — the reference's documented SQL surface (SURVEY.md §2):
  counts, group-by frequency, top-k by recency, range/numeric predicates,
  error analysis — expressed as DataFrame plans over the driver testdata
  (``events`` stands in for the reference's ``api`` table, FIXTURES.md §1)
  and reusable over any api-schema DataFrame.
- :mod:`analytics` — join / window / set-op / rollup extensions the
  reference lacks (SURVEY.md §2.5), built for 100 TB plans.
"""

from . import analytics, api_logs  # noqa: F401
