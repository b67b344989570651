"""robots.txt matcher + config loader unit tests."""

import pytest

from walker_spark.config import CrawlConfig, Target, load_config, sort_paths_by_length
from walker_spark.functions.robots import parse_robots


def test_robots_basic_groups():
    body = """
# comment
User-agent: googlebot
Disallow: /g/

User-agent: *
Disallow: /private/
Allow: /private/open/
"""
    data = parse_robots(body)
    star = data.find_group("walker-spark")
    assert star.test("/public/x") is True
    assert star.test("/private/x") is False
    assert star.test("/private/open/x") is True  # longest match wins, Allow
    g = data.find_group("googlebot-images")  # prefix match on token
    assert g.test("/g/page") is False
    assert g.test("/private/x") is True  # google group has no /private rule


def test_robots_wildcards_and_anchors():
    body = """User-agent: *
Disallow: /*.pdf$
Disallow: /tmp*
Allow: /tmp-open
"""
    g = parse_robots(body).find_group("x")
    assert g.test("/file.pdf") is False
    assert g.test("/file.pdf.html") is True  # $ anchor
    assert g.test("/tmp/x") is False
    assert g.test("/tmp-open") is True  # longer pattern wins
    assert g.test("/other") is True


def test_robots_disallow_all_and_empty():
    g = parse_robots("User-agent: *\nDisallow: /\n").find_group("a")
    assert g.test("/") is False and g.test("/x") is False
    # empty Disallow matches nothing → allow all
    g2 = parse_robots("User-agent: *\nDisallow:\n").find_group("a")
    assert g2.test("/x") is True
    # no robots groups at all → allowed
    g3 = parse_robots("").find_group("a")
    assert g3.test("/x") is True


def test_robots_multi_agent_group():
    body = """User-agent: a
User-agent: b
Disallow: /x/
"""
    d = parse_robots(body)
    assert d.find_group("a").test("/x/1") is False
    assert d.find_group("b").test("/x/1") is False
    assert d.find_group("c").test("/x/1") is True


def test_config_string_target():
    c = load_config("target: https://example.com\n")
    assert c.target.base_url == "https://example.com"
    assert c.target.paths == ["/"]  # default path (config.go:125-137)
    assert c.concurrency == 2 and c.agent == "foomo-walker"  # defaults


def test_config_target_with_path_moves_to_paths():
    c = load_config("target: https://example.com/shop\n")
    assert c.target.paths == ["/shop"]
    assert c.target.base_url == "https://example.com"


def test_config_structured_target():
    c = load_config(
        """
target:
  baseurl: https://example.com
  paths:
    - /a
    - /b
depth: 3
ignoreallqueries: true
agent: custom-bot
"""
    )
    assert c.target.base_url == "https://example.com"
    assert c.target.paths == ["/a", "/b"]
    assert c.depth == 3 and c.ignore_all_queries is True and c.agent == "custom-bot"


def test_config_empty_target_fails():
    with pytest.raises(ValueError):
        load_config("depth: 1\n")


def test_seed_urls_mirror_restart():
    c = CrawlConfig(target=Target(base_url="https://h.example?x=1", paths=["/a", "/b"]))
    assert c.seed_urls() == ["https://h.example/a?x=1", "https://h.example/b?x=1"]


def test_sort_paths_by_length():
    assert sort_paths_by_length(["/a", "/abc", "/ab"]) == ["/abc", "/ab", "/a"]
