"""robots.txt (RFC 9309) parser + longest-match policy filter tests."""

import pyarrow as pa
import ray.data

from feast_ray.functions.robots import (
    compile_rules,
    parse_robots,
    robots_filter,
)


BODY = """
# comment line
User-agent: googlebot
Disallow: /private/

User-agent: feastbot
User-agent: feastbot-images
Allow: /public/
Disallow: /

User-agent: *
Disallow: /all/
Crawl-delay: 10
"""


def test_group_selection_exact_beats_star():
    rules = parse_robots(BODY, "feastbot")
    assert rules == [(True, "/public/"), (False, "/")]


def test_star_group_fallback():
    assert parse_robots(BODY, "unknownbot") == [(False, "/all/")]


def test_longest_agent_token_wins():
    body = ("User-agent: feast\nDisallow: /a/\n"
            "User-agent: feastbot\nDisallow: /b/\n")
    # both prefix-match the token; the longer one wins
    assert parse_robots(body, "feastbot-news") == [(False, "/b/")]


def test_consecutive_agents_share_group():
    rules = parse_robots(BODY, "feastbot-images")
    assert rules == [(True, "/public/"), (False, "/")]


def test_empty_disallow_is_allow_all():
    body = "User-agent: *\nDisallow:\n"
    assert parse_robots(body, "any") == []


def test_rule_before_agent_ignored():
    body = "Disallow: /x/\nUser-agent: *\nDisallow: /y/\n"
    assert parse_robots(body, "any") == [(False, "/y/")]


def _decide(rules, urls):
    ds = ray.data.from_arrow(pa.table({"url": urls}))
    out = robots_filter(ds, "url", rules).take_all()
    return [r["allowed"] for r in out]


def test_longest_match_and_tie_allow_wins():
    rules = [
        ("h.com", False, "/a"),
        ("h.com", True, "/a/b"),      # longer -> wins under /a/b
        ("h.com", False, "/c/"),
        ("h.com", True, "/c/"),       # same octets -> Allow wins tie
    ]
    got = _decide(rules, [
        "https://h.com/a/x",          # disallow /a
        "https://h.com/a/b/x",        # allow /a/b (longer)
        "https://h.com/c/z",          # tie -> allow
        "https://h.com/other",        # no match -> allowed
        "https://other.com/a/x",      # other host -> allowed
    ])
    assert got == [False, True, True, True, True]


def test_wildcard_and_anchor():
    rules = [
        ("h.com", False, "/*.pdf$"),
        ("h.com", False, "/tmp*"),
    ]
    got = _decide(rules, [
        "https://h.com/docs/file.pdf",     # matches /*.pdf$
        "https://h.com/docs/file.pdfx",    # $ anchor -> no match
        "https://h.com/tmp/scratch",       # prefix wildcard
        "https://h.com/temporary",         # '/tmp' is not a prefix here
    ])
    assert got == [False, True, False, True]


def test_bare_host_path_defaults_to_slash():
    rules = [("h.com", False, "/")]
    assert _decide(rules, ["https://h.com"]) == [False]


def test_compile_rules_octets():
    out = compile_rules([("H.com", False, "/a*"), ("h.com", True, "/b")])
    assert out[0][0] == "h.com" and out[0][2] == 3
    assert isinstance(out[1][3], str)
