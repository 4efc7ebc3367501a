#!/usr/bin/env python3
"""Seeded fuzz differential for the HTML tokenizer: generate many random
documents (within the SURVEY.md §5.2 fixture grammar, plus deliberately
malformed fragments), run the stdlib html.parser oracle, emit
src/test/resources/vectors/html_fuzz.tsv in the same format as
html_vectors.tsv. Deterministic: seed=42.
"""
import base64
import io
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_vectors import Oracle  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VEC = os.path.join(ROOT, "src/test/resources/vectors")

rng = random.Random(42)

WORDS = ["alpha", "beta", "café", "x&y", "1<2", "a&amp;b", "&copy;",
         "&#65;", "&#x42;", "tail", "élève", "&nbsp;", "&notit;",
         "plain", "5 > 3", "q&q", "&bogus;", "&amp", "end&"]
TAGS = ["p", "div", "span", "b", "i", "li", "td", "h1", "em"]
HREFS = ["/a", "b.html", "../up", "?q=1", "#f", "//ext.example.org/p",
         "x;p", "mailto:a@b.c", "", "/with space", "a&amp;b=1", "&copy=2",
         "HTTP://CASE/Q", "javascript:x()", "/deep/../path"]
ATTR_JUNK = [' class="c"', " id=i7", " data-x='q'", " title=\"a &lt; b\"",
             " disabled", " href-like=no"]


def gen_a(depth):
    href = rng.choice(HREFS)
    q = rng.choice(['"', "'", ""])
    pre = rng.choice(ATTR_JUNK) if rng.random() < 0.3 else ""
    post = rng.choice(ATTR_JUNK) if rng.random() < 0.3 else ""
    if q == "" and (href == "" or " " in href):
        href = "/fallback"
    valueless = rng.random() < 0.05
    attr = " href" if valueless else f" href={q}{href}{q}"
    body = gen_content(depth + 1, 2)
    selfclose = rng.random() < 0.1
    if selfclose:
        return f"<a{pre}{attr}{post}/>"
    return f"<a{pre}{attr}{post}>{body}</a>"


def gen_content(depth, max_items=4):
    if depth > 4:
        return rng.choice(WORDS)
    parts = []
    for _ in range(rng.randint(1, max_items)):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice(WORDS))
        elif r < 0.55:
            parts.append(gen_a(depth))
        elif r < 0.75:
            t = rng.choice(TAGS)
            parts.append(f"<{t}>{gen_content(depth + 1)}</{t}>")
        elif r < 0.82:
            parts.append(f"<!-- comment {rng.randint(0, 99)} <a href=/no>x</a> -->")
        elif r < 0.88:
            parts.append(f"<script>var x = '<a href=/no{rng.randint(0,9)}>' && 1;</script>")
        elif r < 0.92:
            parts.append(f"<style>.c{rng.randint(0,9)} {{ content: \"<a href=/no>\" }}</style>")
        elif r < 0.95:
            parts.append(f"<br{'/' if rng.random() < 0.5 else ''}>")
        elif r < 0.97:
            parts.append(f"<?pi data {rng.randint(0,9)} ?>")
        else:
            parts.append(rng.choice([
                "<!DOCTYPE html>", "</>", "<1notag>", "< spaced>",
                "bare & amp", "a &#xA9; b", "&#999999;", "<![CDATA[ x ]]>",
            ]))
    return "".join(parts)


def main():
    out = os.path.join(VEC, "html_fuzz.tsv")
    with open(out, "w", encoding="utf-8") as f:
        f.write("name\thtml_b64\tlinks_json_b64\ttext_b64\n")
        for i in range(400):
            doc = gen_content(0, 6)
            if rng.random() < 0.5:
                doc = f'<html><head><meta charset="utf-8"><title>T{i}</title></head><body>{doc}</body></html>'
            raw = doc.encode("utf-8")
            o = Oracle()
            o.feed(raw.decode("utf-8"))
            o.close()
            b64 = lambda s: base64.b64encode(  # noqa: E731
                s.encode("utf-8") if isinstance(s, str) else s).decode("ascii")
            f.write("\t".join([
                f"fuzz{i:03d}", b64(raw),
                b64(json.dumps(o.links, ensure_ascii=False)),
                b64(o.text.getvalue()),
            ]) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
