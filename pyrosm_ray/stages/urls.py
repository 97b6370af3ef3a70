"""URL canonicalization (training-data pipeline staple; RE2 kernels only,
so DuckDB oracles evaluate the same regex semantics).

Canonical form: fragment stripped; scheme and host lowercased (path/query
case PRESERVED — it is significant); default ports dropped (http:80,
https:443); empty path becomes "/". Non-URL rows (no scheme://host match)
pass through with only the fragment stripped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

def canonicalize_batch(batch: pa.Table, url_col: str = "url",
                       out_col: str = "url_canon") -> pa.Table:
    u = pc.replace_substring_regex(batch[url_col], r"#.*$", "")
    m = pc.extract_regex(
        u, r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/:?#]*)"
           r"(?P<port>:[0-9]*)?(?P<rest>.*)$")
    matched = pc.is_valid(m)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    host = pc.utf8_lower(pc.struct_field(m, "host"))
    port = pc.fill_null(pc.struct_field(m, "port"), "")
    rest = pc.struct_field(m, "rest")
    # default ports drop; empty path -> "/"
    drop = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, ":80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, ":443")))
    port = pc.if_else(drop, "", port)
    rest = pc.if_else(pc.equal(rest, ""), "/", rest)
    canon = pc.binary_join_element_wise(scheme, "://", host, port, rest, "")
    out = pc.if_else(matched, canon, u)
    return batch.append_column(out_col, out)


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "url_canon"):
    return ds.map_batches(
        lambda b: canonicalize_batch(b, url_col, out_col),
        batch_format="pyarrow")


def canonicalize_sql(url_expr: str = "url") -> str:
    """DuckDB expression reproducing :func:`canonicalize_batch` exactly
    (same RE2 patterns; unmatched optional group -> '' in duckdb,
    handled identically)."""
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    pat = (r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/:?#]*)(:[0-9]*)?(.*)$")
    scheme = f"lower(regexp_extract({u}, '{pat}', 1))"
    host = f"lower(regexp_extract({u}, '{pat}', 2))"
    port = f"regexp_extract({u}, '{pat}', 3)"
    rest = f"regexp_extract({u}, '{pat}', 4)"
    port_c = (f"CASE WHEN ({scheme} = 'http' AND {port} = ':80') "
              f"OR ({scheme} = 'https' AND {port} = ':443') "
              f"THEN '' ELSE {port} END")
    rest_c = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    return (f"CASE WHEN regexp_matches({u}, '{pat}') "
            f"THEN {scheme} || '://' || {host} || {port_c} || {rest_c} "
            f"ELSE {u} END")
