#!/usr/bin/env python3
"""Robots-parser fuzz vectors: random robots.txt bodies (gnarly whitespace,
exotic line separators, comments, garbage lines, multi-group files) run
through the Python contract oracle (tools/gen_site_fixtures.py parse_robots/
robots_allowed), emitting (body, url) -> allowed decisions.

Output: src/test/resources/vectors/robots_fuzz.tsv
  body_b64 \t url \t allowed(0|1)
"""
import base64
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_site_fixtures import parse_robots, robots_allowed  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "src/test/resources/vectors/robots_fuzz.tsv")


def main():
    r = random.Random(20260816)
    fields = ["User-agent", "user-agent", "USER-AGENT", "Useragent",
              "Allow", "allow", "ALLOW", "Disallow", "disallow", "DISALLOW",
              "Crawl-delay", "Sitemap", "foo"]
    agents = ["*", "other-bot", "graft", "**", ""]
    values = ["/", "/a", "/a/b", "/ab", "/a b", "/private/", "/private/ok",
              "", "/tmp", "x", "/%7Ej", "/a#notvalue", "/:", "*"]
    # strip() in the oracle is Python str.strip: includes NBSP, FS, NEL
    pads = ["", " ", "\t", "\u00a0", "  ", "\x1c", "\x85"]
    # splitlines() boundaries beyond \n/\r\n: VT FF FS GS RS NEL LS PS
    seps = ["\n", "\n", "\n", "\r\n", "\r", "\x0b", "\x0c", "\x1c",
            "\x1d", "\x1e", "\x85", "\u2028", "\u2029", " "]
    comments = ["", "", " # c", "#x", " #", "# a: b"]
    query_paths = ["/", "/a", "/a/b", "/ab", "/abc", "/a b", "/private/x",
                   "/private/ok1", "/tmp/z", "/x", "/%7Ej/k", ""]

    rows = []
    for _ in range(250):
        nlines = r.randint(0, 12)
        parts = []
        # bias toward a live `*` group so allow/disallow decisions are dense
        if r.random() < 0.6:
            parts.append("User-agent:" + r.choice(pads) + "*" + r.choice(seps))
        for _ in range(nlines):
            kind = r.random()
            if kind < 0.55:
                # half the rule lines are straight Allow/Disallow so the
                # decision space is dense; the rest sample the full pool
                f = (r.choice(["Allow", "Disallow", "Disallow"])
                     if r.random() < 0.5 else r.choice(fields))
                v = r.choice(agents) if "gent" in f.lower() else r.choice(values)
                line = (r.choice(pads) + f + r.choice(pads) + ":" +
                        r.choice(pads) + v + r.choice(pads) + r.choice(comments))
            elif kind < 0.7:
                line = r.choice(["no colon here", "::", ":", "a:b:c",
                                 "#only comment", "", " ", " "])
            else:
                f = r.choice(fields)
                line = f + ":" + r.choice(values) + r.choice(comments)
            parts.append(line + r.choice(seps))
        body = "".join(parts)
        rules = parse_robots(body)
        for p in r.sample(query_paths, 5):
            url = "https://h.example.com" + p
            rows.append((body, url, 1 if robots_allowed(url, rules) else 0))

    with open(OUT, "w", encoding="utf-8") as f:
        f.write("body_b64\turl\tallowed\n")
        for body, url, a in rows:
            f.write(base64.b64encode(body.encode("utf-8")).decode("ascii") +
                    f"\t{url}\t{a}\n")
    blocked = sum(1 for _, _, a in rows if a == 0)
    print(f"{len(rows)} vectors ({blocked} blocked) -> {OUT}")


if __name__ == "__main__":
    main()
