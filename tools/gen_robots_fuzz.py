#!/usr/bin/env python3
"""Robots-parser fuzz vectors: random robots.txt bodies (gnarly whitespace,
exotic line separators, comments, garbage lines, multi-group files,
crawl-delay values across the full Python float() grammar) run through the
Python contract oracle (tools/gen_site_fixtures.py parse_robots_full/
robots_allowed), emitting (body, url) -> allowed decisions plus the parsed
crawl-delay.

Output: src/test/resources/vectors/robots_fuzz.tsv
  body_b64 \t url \t allowed(0|1) \t delay
  delay: '' = none, 'nan' = any NaN, else big-endian IEEE-754 bit hex
"""
import base64
import os
import random
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_site_fixtures import parse_robots_full, robots_allowed  # noqa: E402


def delay_repr(d):
    if d is None:
        return ""
    if d != d:  # NaN: canonical (sign bit is parser-internal noise)
        return "nan"
    return struct.pack(">d", d).hex()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "src/test/resources/vectors/robots_fuzz.tsv")


def main():
    r = random.Random(20260816)
    fields = ["User-agent", "user-agent", "USER-AGENT", "Useragent",
              "Allow", "allow", "ALLOW", "Disallow", "disallow", "DISALLOW",
              "Crawl-delay", "crawl-delay", "CRAWL-DELAY", "Sitemap", "foo"]
    agents = ["*", "other-bot", "graft", "**", ""]
    values = ["/", "/a", "/a/b", "/ab", "/a b", "/private/", "/private/ok",
              "", "/tmp", "x", "/%7Ej", "/a#notvalue", "/:", "*"]
    # crawl-delay values spanning the Python float() grammar: plain, signed,
    # exponents, bare-dot forms, underscores, inf/nan, unicode digits,
    # rejections (empty, garbage, bad underscores, hex, internal space)
    delays = ["1", "2.5", "10", "0", "-3", "007", "1e1", "1E-1", ".5", "5.",
              "1.e2", "1_0", "1_0.2_5", "6e1", "+30", "inf", "-Infinity",
              "nan", "-nan", "٣٠", "", "abc", "1__0", "_1", "1_",
              "1 0", "0x10", "1d", ".", "+", "30#x"]
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
                if "gent" in f.lower():
                    v = r.choice(agents)
                elif "delay" in f.lower():
                    v = r.choice(delays)
                else:
                    v = r.choice(values)
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
        rules, delay = parse_robots_full(body)
        for p in r.sample(query_paths, 5):
            url = "https://h.example.com" + p
            rows.append((body, url, 1 if robots_allowed(url, rules) else 0,
                         delay_repr(delay)))

    with open(OUT, "w", encoding="utf-8") as f:
        f.write("body_b64\turl\tallowed\tdelay\n")
        for body, url, a, dl in rows:
            f.write(base64.b64encode(body.encode("utf-8")).decode("ascii") +
                    f"\t{url}\t{a}\t{dl}\n")
    blocked = sum(1 for _, _, a, _ in rows if a == 0)
    with_delay = sum(1 for _, _, _, dl in rows if dl)
    print(f"{len(rows)} vectors ({blocked} blocked, {with_delay} with "
          f"crawl-delay) -> {OUT}")
    budgets()


BUDGET_OUT = os.path.join(ROOT, "src/test/resources/vectors/delay_budget.tsv")


def budgets():
    """Politeness-budget floordiv vectors: positive finite crawl-delay d ->
    max(1, int(60.0 // d)) with CPython float floordiv semantics. The naive
    floor(60.0 / d) of the ROUNDED quotient is off by one for thousands of
    representable delays (60.0 / 6.666666666666667 rounds to 9.0 but
    60.0 // 6.666666666666667 == 8.0); this file pins the exact contract.
    Format: delay_bits_hex \t budget \t diverges(0|1 vs naive floor).
    """
    import math
    r = random.Random(20260817)
    ds = []
    # near-divisor deltas: d = 60/n nudged by ulps — the divergence hotspot
    for n in list(range(2, 400)) + [7, 9, 13, 19, 23, 29]:
        base = 60.0 / n
        for ulps in (-2, -1, 0, 1, 2):
            ds.append(math.nextafter(base, math.inf if ulps > 0 else 0.0)
                      if ulps != 0 else base)
            for _ in range(abs(ulps) - 1):
                ds[-1] = math.nextafter(ds[-1], math.inf if ulps > 0 else 0.0)
    # broad random sweep across magnitudes
    for _ in range(2000):
        ds.append(r.uniform(0.01, 200.0))
    for _ in range(500):
        ds.append(r.uniform(1e-3, 1e-2))
    ds += [6.666666666666667, 3.1578947368421053, 60.0, 59.999999999999996,
           60.000000000000007, float("inf")]
    rows = []
    for d in ds:
        if not (d > 0):
            continue
        budget = max(1, int(60.0 // d))
        naive = 1 if math.isinf(d) else max(1, int(math.floor(60.0 / d)))
        rows.append((struct.pack(">d", d).hex(), budget,
                     1 if naive != budget else 0))
    with open(BUDGET_OUT, "w", encoding="utf-8") as f:
        f.write("delay_bits\tbudget\tdiverges\n")
        for b, budget, dv in rows:
            f.write(f"{b}\t{budget}\t{dv}\n")
    ndiv = sum(dv for _, _, dv in rows)
    print(f"{len(rows)} budget vectors ({ndiv} diverge from naive floor) "
          f"-> {BUDGET_OUT}")


if __name__ == "__main__":
    main()
