"""robots.txt parsing + compliance audit (round 10,
``sources/robots.py``) — RFC 9309 semantics pinned against the RFC's
own examples, then the distributed audit over a multi-host crawl."""

from __future__ import annotations

import pytest

from mapreduce_framework_for_mergesort_spark.sources import robots as R

EXAMPLE = """
# comments are stripped
User-agent: googlebot-news
Disallow: /news/archive

User-agent: *
Disallow: /private/
Allow: /private/public$
Crawl-delay: 2.5

User-agent: examplebot
User-agent: otherbot
Allow: /folder
Disallow: /folder*x
Sitemap: https://ex.com/sitemap.xml

User-agent: examplebot
Disallow: /merged/
"""


def _decide(agent, path, text=EXAMPLE):
    return R.RobotsMatcher(R.parse_robots(text), agent).decide(path)


def test_parse_shapes():
    p = R.parse_robots(EXAMPLE)
    assert [g["agents"] for g in p["groups"]] == [
        ["googlebot-news"], ["*"], ["examplebot", "otherbot"],
        ["examplebot"],
    ]
    assert p["sitemaps"] == ["https://ex.com/sitemap.xml"]
    assert p["groups"][1]["crawl_delay"] == 2.5


def test_group_selection_longest_agent_prefix():
    # product token 'examplebot/1.2' prefix-matches 'examplebot'
    assert _decide("ExampleBot/1.2", "/folder/a") == (True, "/folder")
    # an agent nobody names falls back to '*'
    assert _decide("strangerbot", "/private/x")[0] is False
    # groups naming the chosen token MERGE their rules
    assert _decide("examplebot", "/merged/doc")[0] is False


def test_longest_match_wins_and_allow_breaks_ties():
    # /private/public$ (15 chars + anchor) beats /private/ (9)
    assert _decide("anybot", "/private/public") == (
        True, "/private/public$")
    # ...but the anchor makes it exact: a longer path falls back
    assert _decide("anybot", "/private/public2")[0] is False
    # wildcard pattern: /folder*x matches /folder/ax and outranks
    # /folder (9 > 7)
    assert _decide("examplebot", "/folder/ax") == (False, "/folder*x")
    # equal length -> Allow wins (RFC 9309 §2.2.2)
    tie = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert _decide("anybot", "/p", tie) == (True, "/p")


def test_defaults_and_tolerance():
    # no matching rule -> allowed; no rules at all -> allowed
    assert _decide("anybot", "/open/page") == (True, None)
    assert _decide("anybot", "/x", "") == (True, None)
    # empty Disallow matches nothing (allow-all idiom)
    assert _decide("anybot", "/x", "User-agent: *\nDisallow:\n") == (
        True, None)
    # junk lines, rule before any group, bad crawl-delay: all skipped
    messy = "Disallow: /orphan\nnot a directive\nUser-agent: *\n" \
            "Crawl-delay: soon\nDisallow: /real\n"
    assert _decide("anybot", "/orphan", messy)[0] is True
    assert _decide("anybot", "/real/x", messy)[0] is False
    # the 500 KiB parsing cap drops the tail deterministically
    big = "User-agent: *\n" + ("# pad\n" * 90_000) + "Disallow: /late\n"
    assert len(big) > R.ROBOTS_MAX_BYTES
    assert _decide("anybot", "/late", big)[0] is True


def test_audit_robots_compliance_distributed(spark):
    pages = spark.createDataFrame(
        [
            (1, "http://A.Ex.COM/private/x"),       # disallowed (*)
            (2, "http://a.ex.com/private/public"),  # allowed ($ rule)
            (3, "http://a.ex.com/open"),            # no rule -> allowed
            (4, "http://other.org/anything"),       # no robots row
            (5, "http://a.ex.com/news/archive/p"),  # '*' group for us
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.ex.com", EXAMPLE)], "host string, robots_txt string"
    )
    got = {
        r["url"]: r
        for r in R.audit_robots_compliance(
            pages, robots, agent="mybot/2.0"
        ).collect()
    }
    assert not got["http://A.Ex.COM/private/x"]["allowed"]
    assert got["http://A.Ex.COM/private/x"]["rule"] == "/private/"
    assert got["http://A.Ex.COM/private/x"]["crawl_delay"] == 2.5
    assert got["http://a.ex.com/private/public"]["allowed"]
    assert got["http://a.ex.com/open"]["allowed"]
    assert got["http://a.ex.com/open"]["rule"] is None
    # googlebot-news group does not apply to mybot: /news allowed
    assert got["http://a.ex.com/news/archive/p"]["allowed"]
    row4 = got["http://other.org/anything"]
    assert row4["allowed"] and not row4["robots_found"]
    # the governance loop: the disallowed set is exactly what a
    # takedown pass would retract
    bad = [u for u, r in got.items() if not r["allowed"]]
    assert bad == ["http://A.Ex.COM/private/x"]


def test_audit_query_string_is_judged(spark):
    pages = spark.createDataFrame(
        [(1, "http://h.com/search?q=secret"), (2, "http://h.com/search")],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /search?*\n")],
        "host string, robots_txt string",
    )
    got = {r["url"]: r["allowed"]
           for r in R.audit_robots_compliance(pages, robots, "b").collect()}
    assert got == {"http://h.com/search?q=secret": False,
                   "http://h.com/search": True}


# ---------------------------------------------------------------------------
# Sitemaps (the discovery format robots' Sitemap: lines point at)
# ---------------------------------------------------------------------------

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://ex.com/a</loc><lastmod>2026-01-02</lastmod></url>
  <url><loc>http://ex.com/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url><!-- no loc: dropped -->
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>http://ex.com/sm-1.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_and_index():
    p = R.parse_sitemap(SITEMAP)
    assert p["kind"] == "urlset"
    assert p["entries"] == [
        {"loc": "http://ex.com/a", "lastmod": "2026-01-02"},
        {"loc": "http://ex.com/b", "lastmod": None},
    ]
    q = R.parse_sitemap(INDEX)  # namespace-free variant parses too
    assert q["kind"] == "sitemapindex"
    assert q["entries"][0]["loc"] == "http://ex.com/sm-1.xml"
    with pytest.raises(ValueError, match="malformed"):
        R.parse_sitemap("<urlset><url>")
    with pytest.raises(ValueError, match="not a sitemap"):
        R.parse_sitemap("<html></html>")


def test_sitemap_urls_distributed(spark):
    df = spark.createDataFrame(
        [("ex.com", SITEMAP), ("bad.org", "not xml at all"),
         ("idx.net", INDEX)],
        "host string, sitemap_xml string",
    )
    got = sorted(
        (r["sitemap_host"], r["loc"], r["lastmod"])
        for r in R.sitemap_urls(df).collect()
    )
    assert got == [
        ("ex.com", "http://ex.com/a", "2026-01-02"),
        ("ex.com", "http://ex.com/b", None),
        ("idx.net", "http://ex.com/sm-1.xml", None),
    ]


def test_plan_recrawl_vs_duckdb(spark):
    """The planner's action table cross-checked against a DuckDB
    replica of the same canonical-join + freshness CASE."""
    import duckdb

    entries = [
        ("ex.com", "http://ex.com/a?utm_source=x", "2026-02-01"),  # refresh
        ("ex.com", "http://ex.com/b", "2026-01-01"),               # current
        ("ex.com", "http://ex.com/c", "2026-03-01T10:00:00"),      # new
        ("ex.com", "http://ex.com/d", None),                       # unknown
        ("ex.com", "http://ex.com/e", "sometime soon"),            # unknown
    ]
    corpus = [
        ("http://EX.com/a", "2026-01-15 00:00:00"),
        ("http://ex.com/b#frag", "2026-01-20 00:00:00"),
        ("http://ex.com/d", "2026-01-01 00:00:00"),
        ("http://ex.com/e", "2026-01-01 00:00:00"),
    ]
    sm = spark.createDataFrame(
        entries, "sitemap_host string, loc string, lastmod string"
    )
    cp = spark.createDataFrame(corpus, "url string, fetched_at string")
    got = {
        r["loc"]: r["action"]
        for r in R.plan_recrawl(sm, cp, fetched_at_col="fetched_at")
        .collect()
    }
    assert got == {
        "http://ex.com/a?utm_source=x": "refresh",
        "http://ex.com/b": "current",
        "http://ex.com/c": "new",
        "http://ex.com/d": "unknown",
        "http://ex.com/e": "unknown",
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE sm(loc VARCHAR, lastmod VARCHAR)")
    con.executemany("INSERT INTO sm VALUES (?, ?)",
                    [(l, m) for _h, l, m in entries])
    con.execute("CREATE TABLE cp(u VARCHAR, f TIMESTAMP)")
    con.executemany("INSERT INTO cp VALUES (?, ?)", corpus)
    # canonical key replicated with string ops (fixture URLs carry
    # only case/tracking/fragment noise)
    expect = dict(con.execute("""
        SELECT loc,
               CASE WHEN f IS NULL AND NOT have THEN 'new'
                    WHEN try_cast(lastmod AS TIMESTAMP) IS NULL
                         OR f IS NULL THEN 'unknown'
                    WHEN try_cast(lastmod AS TIMESTAMP) > f
                         THEN 'refresh'
                    ELSE 'current' END AS action
        FROM (
          SELECT loc, lastmod, f, f IS NOT NULL OR have AS have
          FROM (
            SELECT loc, lastmod, cp.f,
                   cp.u IS NOT NULL AS have
            FROM sm LEFT JOIN cp
              ON lower(regexp_replace(
                     split_part(split_part(sm.loc, '#', 1), '?', 1),
                     '^http://', '')) =
                 lower(regexp_replace(
                     split_part(split_part(cp.u, '#', 1), '?', 1),
                     '^http://', ''))
          )
        )
    """).fetchall())
    assert got == expect


def test_disallowed_set_feeds_takedown(spark, tmp_path):
    """The governance loop, executed: crawl pages ingest into the
    continuous corpus, the robots audit finds retroactively-disallowed
    URLs, retract_documents takes them down, and the masked corpus
    read excludes exactly those rows."""
    from pyspark.sql import functions as F

    from mapreduce_framework_for_mergesort_spark.streaming import (
        ingest as I,
    )

    out, idx = str(tmp_path / "corpus"), str(tmp_path / "index")
    pages = [
        (1, "http://h.ex/keep/1", "the mayor opened the new library"),
        (2, "http://h.ex/private/2", "please keep this page out of it"),
        (3, "http://h.ex/keep/3", "the bridge reopened after repairs"),
        (4, "http://h.ex/private/4", "another page the rules disallow"),
    ]
    batch = spark.createDataFrame(
        pages, "doc_id long, url string, text string"
    )
    I.accept_batch(batch.select("doc_id", "text"), idx, out, epoch=1)

    robots = spark.createDataFrame(
        [("h.ex", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    audit = R.audit_robots_compliance(batch, robots, agent="bot")
    disallowed_ids = [
        r["doc_id"]
        for r in batch.join(
            audit.where(~F.col("allowed")).select("url"), "url"
        ).collect()
    ]
    assert sorted(disallowed_ids) == [2, 4]
    assert I.retract_documents(spark, out, disallowed_ids, "robots-r10")
    got = sorted(
        r["doc_id"] for r in I.read_corpus(spark, out).collect()
    )
    assert got == [1, 3]


def test_sitemap_is_transparent_to_agent_run():
    # RFC 9309: non-group records don't split a consecutive user-agent
    # run — 'a / Sitemap / b / Disallow: /' is ONE group covering both
    # agents (ADVICE round 11; Google's reference parser agrees)
    text = "User-agent: a\nSitemap: http://ex.com/s.xml\n" \
           "User-agent: b\nDisallow: /\n"
    p = R.parse_robots(text)
    assert len(p["groups"]) == 1
    assert p["groups"][0]["agents"] == ["a", "b"]
    assert p["sitemaps"] == ["http://ex.com/s.xml"]
    assert _decide("a", "/anything", text)[0] is False
    # unknown directives are equally transparent
    text2 = "User-agent: a\nHost: ex.com\nUser-agent: b\nDisallow: /x\n"
    p2 = R.parse_robots(text2)
    assert p2["groups"][0]["agents"] == ["a", "b"]


def test_sitemap_gz_and_fractional_lastmod(spark):
    """Round-11 coverage: gzipped child sitemaps inflate (string OR
    binary column), and fractional-second W3C lastmod parses instead
    of degrading to 'unknown' — both DuckDB-pinned."""
    import duckdb
    import gzip

    xml = (
        "<urlset>"
        "<url><loc>http://ex.com/a</loc>"
        "<lastmod>2026-01-01T00:00:00.000Z</lastmod></url>"
        "<url><loc>http://ex.com/b</loc>"
        "<lastmod>2025-03-04T05:06:07.890+02:00</lastmod></url>"
        "<url><loc>http://ex.com/c</loc>"
        "<lastmod>2024-02-03</lastmod></url>"
        "</urlset>"
    )
    gz = gzip.compress(xml.encode())
    # bytes path (binary column) and parse_sitemap directly
    assert [e["loc"] for e in R.parse_sitemap(gz)["entries"]] == [
        "http://ex.com/a", "http://ex.com/b", "http://ex.com/c"
    ]
    with pytest.raises(ValueError, match="corrupt gzipped"):
        R.parse_sitemap(b"\x1f\x8btruncated")
    df = spark.createDataFrame(
        [("ex.com", bytearray(gz))], "host string, sitemap_xml binary"
    )
    rows = R.sitemap_urls(df).collect()
    assert len(rows) == 3
    corpus = spark.createDataFrame(
        [("http://ex.com/a", "2025-06-01 00:00:00"),
         ("http://ex.com/b", "2025-06-01 00:00:00"),
         ("http://ex.com/c", "2025-06-01 00:00:00")],
        "url string, fetched_at string",
    )
    got = {
        r["loc"]: (r["action"], r["lastmod_ts"])
        for r in R.plan_recrawl(
            R.sitemap_urls(df), corpus, fetched_at_col="fetched_at"
        ).collect()
    }
    # DuckDB independently parses the same W3C stamps and applies the
    # same freshness rule
    con = duckdb.connect()
    expected = con.execute(
        """
        SELECT loc, CASE WHEN lastmod_ts > fetched THEN 'refresh'
                         ELSE 'current' END
        FROM (VALUES
          ('http://ex.com/a', TIMESTAMPTZ '2026-01-01 00:00:00.000+00'),
          ('http://ex.com/b', TIMESTAMPTZ '2025-03-04 05:06:07.890+02'),
          ('http://ex.com/c', TIMESTAMP '2024-02-03')
        ) t(loc, lastmod_ts), (VALUES (TIMESTAMP '2025-06-01')) f(fetched)
        """
    ).fetchall()
    for loc, action in expected:
        assert got[loc][0] == action, (loc, got[loc], action)
    # none degraded to unknown: every lastmod parsed
    assert all(ts is not None for _a, ts in got.values())


def test_sitemapindex_two_hop_fanout(spark):
    """sitemapindex rows ARE sitemap_urls rows whose locs name child
    maps — a second sitemap_urls pass over the (fetched) children
    yields page entries; gz children participate."""
    import gzip

    index = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://ex.com/s-a.xml</loc></sitemap>"
        "<sitemap><loc>http://ex.com/s-b.xml.gz</loc></sitemap>"
        "</sitemapindex>"
    )
    hop1 = R.sitemap_urls(
        spark.createDataFrame(
            [("ex.com", index)], "host string, sitemap_xml string"
        )
    ).collect()
    assert sorted(r["loc"] for r in hop1) == [
        "http://ex.com/s-a.xml", "http://ex.com/s-b.xml.gz"
    ]
    children = spark.createDataFrame(
        [
            ("ex.com", bytearray(
                b"<urlset><url><loc>http://ex.com/p1</loc></url></urlset>"
            )),
            ("ex.com", bytearray(gzip.compress(
                b"<urlset><url><loc>http://ex.com/p2</loc></url></urlset>"
            ))),
        ],
        "host string, sitemap_xml binary",
    )
    hop2 = R.sitemap_urls(children).collect()
    assert sorted(r["loc"] for r in hop2) == [
        "http://ex.com/p1", "http://ex.com/p2"
    ]
