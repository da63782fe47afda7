"""parse_robots RFC 9309 grouping semantics on a hand fixture."""

from bdtopo2refhydro_spark.operators.corpus import parse_robots


def test_parse_robots_grouping(spark):
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /private/",
        "Allow: /private/pub/",
        "",                      # blank line: dropped (no ':')
        "User-agent: alpha",
        "User-agent: beta",      # consecutive UA -> SAME group
        "Disallow: /tmp/",
        "Crawl-delay: 5",        # unknown directive: dropped
        "User-agent: gamma",     # new group after non-UA line
        "Allow: /",
    ])
    df = spark.createDataFrame([("h.example.com", txt)],
                               "host string, robots_txt string")
    rows = {(r["agent"], r["rule"], r["path"])
            for r in parse_robots(df).collect()}
    assert rows == {
        ("*", "disallow", "/private/"),
        ("*", "allow", "/private/pub/"),
        ("alpha", "disallow", "/tmp/"),
        ("beta", "disallow", "/tmp/"),
        ("gamma", "allow", "/"),
    }


def test_parse_robots_rules_before_any_group_dropped(spark):
    txt = "Disallow: /orphan/\nUser-agent: a\nDisallow: /x/"
    df = spark.createDataFrame([("h", txt)],
                               "host string, robots_txt string")
    rows = {(r["agent"], r["rule"], r["path"])
            for r in parse_robots(df).collect()}
    # the orphan rule belongs to group 0 which has no agents -> dropped
    assert rows == {("a", "disallow", "/x/")}
