"""DuckDB oracle-SQL builders for the non-trivially-SQL queries.

The driver runs each ``oracle_sql()`` string against DuckDB views of the
same parquet tables and hash-compares with the Spark result (sf0.01).
PageRank is expressible as 10 unrolled CTE iterations replicating the
reference-parity semantics exactly (SURVEY.md §5,§7).
"""

from __future__ import annotations

# (src, dst) edge derivation shared by the Spark query and the oracle:
# supplier-to-supplier edges from lineitem. dst spans 2x the supplier
# key range, so half the targets are "red links" (no page of their own,
# dropped per PageRank.java:527); duplicate edges occur naturally
# (multiple lineitems with the same (suppkey, partkey%m)) and scatter
# rank once per occurrence (PageRank.java:454-468).
EDGES_SQL = (
    "SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src, "
    "'s' || CAST((l_partkey % (2 * (SELECT count(*) FROM supplier))) + 1 AS VARCHAR) AS dst "
    "FROM lineitem"
)


def pagerank_sql(
    edges_sql: str = EDGES_SQL,
    n_iters: int = 10,
    damping: float = 0.85,
    round_digits: int = 6,
    limit: int | None = None,
) -> str:
    """Unrolled reference-parity PageRank as one DuckDB query.

    Per iteration: contrib(dst) = sum over edge occurrences of
    rank(src)/out_degree(src); new rank = (1-d) + d*coalesce(contrib,0)
    over the vertex set only (red links dropped, zero-inbound pages kept
    at (1-d) — PageRank.java:493,515,523,527).
    """
    parts = [
        f"WITH links AS ({edges_sql}),",
        "pages AS (SELECT DISTINCT src AS url FROM links),",
        "deg AS (SELECT src, count(*) AS d FROM links GROUP BY src),",
        "r0 AS (SELECT url, 1.0 / (SELECT count(*) FROM pages) AS rank FROM pages),",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"r{i} AS (SELECT p.url, {1.0 - damping} + {damping} * coalesce(s.c, 0) AS rank "
            "FROM pages p LEFT JOIN ("
            "SELECT l.dst AS url, sum(r.rank / d.d) AS c "
            f"FROM links l JOIN r{i - 1} r ON l.src = r.url "
            "JOIN deg d ON l.src = d.src GROUP BY l.dst) s ON p.url = s.url),"
        )
    final = f"SELECT url, round(rank, {round_digits}) AS rank FROM r{n_iters}"
    if limit is not None:
        final += f" ORDER BY rank DESC, url ASC LIMIT {limit}"
    # strip trailing comma from the last CTE
    parts[-1] = parts[-1].rstrip(",") + ","
    sql = "\n".join(parts)
    sql = sql.rstrip(",") if sql.endswith(",") else sql
    return sql + "\n" + final
