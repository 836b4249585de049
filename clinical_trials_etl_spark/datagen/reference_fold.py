"""Independent in-memory reducer computing the expected final table
state for a change log (FIXTURES.md §2: per url, apply events in lsn
order, last-write-wins, delete removes the row).

Deliberately NOT Spark: a plain dict fold over collected rows, used by
the replay-equivalence tests as the ground truth the distributed path
must match (SURVEY.md §5 test 1). Test-scale only.
"""

from __future__ import annotations

from clinical_trials_etl_spark.functions.html_extract import _extract_text_one


def fold_changelog(rows: list[dict]) -> dict[str, dict]:
    """rows: transport-schema dicts (lsn, op, url, warc_ts, html, lang,
    language, fetch_status, schema_ver). Returns url -> final row in the
    *latest* schema naming (language, fetch_status long), with ``text``
    computed by the pure-Python extraction kernel."""
    # dedup duplicate deliveries (same lsn => identical payload), then
    # order by lsn
    by_lsn: dict[int, dict] = {}
    for r in rows:
        by_lsn.setdefault(r["lsn"], r)
    state: dict[str, dict] = {}
    for lsn in sorted(by_lsn):
        r = by_lsn[lsn]
        url = r["url"]
        if r["op"] == "D":
            state.pop(url, None)
            continue
        html = r["html"]
        state[url] = {
            "url": url,
            "warc_ts": r["warc_ts"],
            "html": bytes(html) if html is not None else None,
            "text": _extract_text_one(html) if html is not None else None,
            "language": r.get("language") or r.get("lang"),
            "fetch_status": r.get("fetch_status"),
        }
    return state
