"""Randomized cross-check of the robots.txt parser and admission gate
against an independent pure-Python reference implementation.

The oracle twins prove Spark ≡ DuckDB; this fuzz proves both ≡ a
straight-line sequential reading of RFC 9309's group-attribution and
longest-match rules, over randomized files the fixtures never wrote
(random case, tabs, comments, blank lines, headless rules, stacked
agents, empty paths, unknown directives). Deterministic seed — a
failure reproduces."""

import random
import sys

sys.path.insert(0, ".")


# --- pure-Python reference (written from the RFC, not from the operator) ---


def ref_parse(txt):
    """[(grp, agent, directive, path)] — sequential group attribution.
    Comments, blanks, colon-less junk and unknown directives are
    TRANSPARENT (they neither end a user-agent stack nor start a
    group): RFC 9309 groups are delimited only by the parseable
    user-agent/allow/disallow lines — sitemap lines routinely sit
    inside groups in the wild."""
    out = []
    grp = 0
    agents = []
    prev_was_agent = False
    for raw in (txt or "").replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip(" \t")
        if ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.rstrip(" \t").lower()
        val = val.strip(" \t")
        if key == "user-agent":
            if not prev_was_agent:
                grp += 1
                agents = []
            agents.append(val.lower())
            prev_was_agent = True
        elif key in ("allow", "disallow"):
            prev_was_agent = False
            if grp > 0 and val != "":
                for a in agents:
                    out.append((grp, a, key, val))
        # other keys: transparent
    return out


def ref_allowed(upath, rules, agent):
    """(allowed, directive, path) for one url path against one host's
    parsed rules — longest prefix wins, allow wins ties."""
    al = agent.lower()
    pool = [r for r in rules if r[1] in (al, "*")]
    if any(r[1] == al for r in pool):
        pool = [r for r in pool if r[1] == al]
    best = None
    for _, _, directive, path in pool:
        if upath.startswith(path):
            cand = (-len(path), 0 if directive == "allow" else 1, directive, path)
            if best is None or cand < best:
                best = cand
    if best is None:
        return True, None, None
    return best[1] == 0, best[2], best[3]


# --- generator -------------------------------------------------------------

KEYS = ["User-agent", "USER-AGENT", "user-agent", "Allow", "allow", "ALLOW",
        "Disallow", "disallow", "DisAllow", "Sitemap", "Crawl-delay", "Host"]
AGENTS = ["*", "bot", "MyBot", "Other", "bOt"]
PATHS = ["/", "/a", "/a/b", "/a/bc", "/p/1", "/p/12", "/q", "", "/x y", "/A"]


def gen_file(rng):
    lines = []
    for _ in range(rng.randint(0, 14)):
        roll = rng.random()
        if roll < 0.12:
            lines.append("")  # blank
        elif roll < 0.2:
            lines.append("# a comment line")
        elif roll < 0.28:
            lines.append(rng.choice(["junk without colon", "::", "weird:thing"]))
        else:
            key = rng.choice(KEYS)
            sep = rng.choice([":", ": ", ":\t", " :"]) if key != " :" else ":"
            if key.lower() == "user-agent":
                val = rng.choice(AGENTS)
            else:
                val = rng.choice(PATHS)
            cmt = "  # c" if rng.random() < 0.2 else ""
            lines.append(f"{key}{sep}{val}{cmt}")
    return "\n".join(lines)


def test_parse_and_admit_match_reference(spark):
    from pdf_extraction_spark.operators.robotstxt import (
        parse_robots,
        robots_allowed,
    )

    rng = random.Random(42)
    files = {f"h{i}": gen_file(rng) for i in range(60)}
    df = spark.createDataFrame(
        list(files.items()), "host string, robots_txt string"
    )
    rules_df = parse_robots(df)
    got = sorted(
        (r["host"], r["grp"], r["agent"], r["directive"], r["path"])
        for r in rules_df.collect()
    )
    want = sorted(
        (h, g, a, d, p)
        for h, txt in files.items()
        for (g, a, d, p) in ref_parse(txt)
    )
    assert got == want

    # admission: 3 urls per host, agent 'bot'
    urls = [
        (f"https://{h}{p}", h)
        for h in files
        for p in ["/a/b/c", "/p/12x", "/q"]
    ]
    udf = spark.createDataFrame(urls, "url string, host string")
    out = {
        (r["url"]): (r["allowed"], r["match_directive"], r["match_path"])
        for r in robots_allowed(udf, rules_df, agent="bot").collect()
    }
    for url, host in urls:
        upath = url.split(host, 1)[1] or "/"
        exp = ref_allowed(upath, ref_parse(files[host]), "bot")
        assert out[url] == exp, (url, files[host], out[url], exp)


def test_reference_itself_on_known_file(spark):
    """Anchor the reference against the hand-checked fixture from
    test_robotstxt so the fuzz can't drift into testing reference ≡
    reference."""
    txt = (
        "User-Agent: *\nDisallow: /private   # c\nAllow:\t/private/ok\n"
        "Crawl-delay: 10\n\nUser-agent: MyBot\nUser-agent: Helper\n"
        "DISALLOW: /p/\nallow: /p/7\nDisallow:\n"
    )
    assert sorted(ref_parse(txt)) == sorted(
        [
            (1, "*", "disallow", "/private"),
            (1, "*", "allow", "/private/ok"),
            (2, "mybot", "disallow", "/p/"),
            (2, "mybot", "allow", "/p/7"),
            (2, "helper", "disallow", "/p/"),
            (2, "helper", "allow", "/p/7"),
        ]
    )
