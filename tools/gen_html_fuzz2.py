#!/usr/bin/env python3
"""Second, nastier HTML fuzz batch (seed 43): malformed constructs that
exercise the tokenizer's recovery paths — unbalanced quotes, bogus comments,
marked sections, end-tags with attrs, missing '>', stray '<'/'&', weird attr
spellings. Output: src/test/resources/vectors/html_fuzz2.tsv.
"""
import base64
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_vectors import Oracle  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VEC = os.path.join(ROOT, "src/test/resources/vectors")

rng = random.Random(43)

NASTY = [
    '<a href="/unclosed>text</a>',
    "<a href='/mix\">m</a>",
    '<a href=/bare/path.html>b</a>',
    '<a href = " spaced " >s</a>',
    '<a href="/x" href="/y">dup</a>',
    '<a href="/q?a=1&amp=2&amp;b=3">e</a>',
    '<a\nhref\n=\n"/nl">n</a>',
    '<a href="/t"/>startend',
    '<a href="/u" / >slashspace',
    '<A HREF="/UP">case</A>',
    '<a hReF="/mx">mx</a>',
    '<a data-x="<b>" href="/angle">angle</a>',
    '<a href>valueless</a>',
    '<a href="">empty</a>',
    '<a href="/semi;p1;p2">semi</a>',
    '</a stray endtag>',
    '</b attr=">">tricky',
    "</>",
    "<!-- unclosed comment",
    "<!-- double -- dash -->",
    "<!--->",
    "<! bogus decl >",
    "<!DOCTYPE html PUBLIC 'x'>",
    "<![CDATA[ <a href=/cd>no</a> ]]>",
    "<![if gt IE 7]>ms<![endif]>",
    "<?php '<a href=/no>' ?>",
    "<?>",
    "< notag>",
    "<1bad>",
    "bare & ampersand &; &#; &#x; &unknown; &amp",
    "<a href='/a'><a href='/b'>nested anchors</a></a>",
    "<script>var s = '</scr' + 'ipt>'; // tricky</script><a href=/after>ok</a>",
    "<script type='t'>x</script >space endtag",
    "<style>a::before{content:'</sty'}</style><a href=/s2>s2</a>",
    "<sCrIpT>mixed case cdata</ScRiPt><a href=/mc>mc</a>",
    "<script>unterminated cdata <a href=/never>",
    "text<b>bold<i>both</b>misnested</i>tail",
    "<a href=&quot;/entityquoted&quot;>eq</a>",
    "<a href='/x'",
    "<td><a href=/in-table>t</a></td>",
    "<a href=\"/tab\there\">tab in attr</a>",
    "trailing <",
    "trailing &",
    "<a href='/f'>f</a><",
    # 8+-hex-digit / huge numeric charrefs (Integer-overflow regression class)
    "big &#xFFFFFFFF; charref",
    "big &#x80000000; charref",
    "zeros &#x0000000041; keep",
    "dec &#4294967295; huge",
    "dec &#0000000065; zeros",
    "edge &#x110000; &#x10FFFF; &#1114112;",
    '<a href="/big?c=&#xFFFFFFFF;">bigattr</a>',
    '<a href="/z&#x0000000041;">zattr</a>',
    # non-ASCII whitespace: Python str-mode \\s (Py_UNICODE_ISSPACE) also
    # matches NBSP, NEL, FS..US, and the Unicode space/line separators --
    # these exercise the engine's spelled-out whitespace class
    '<a\u00a0href="/nbsp-sep">nbsp between tag and attr</a>',
    '<a href\u00a0=\u00a0"/nbsp-eq">nbsp around =</a>',
    '<a href=/bare\u00a0rest>nbsp ends bare value</a>',
    '<a href="/t"\u3000>ideographic space before gt</a>',
    '<a\u2028href="/ls">line separator</a>',
    '<a\x1chref="/fs">file separator</a>',
    '<a\x85href="/nel">NEL</a>',
    '</a\u00a0>nbsp endtag</a>',
    '</a\u2003\u2003>em-space endtag',
    '<!-- c --\u3000>after comment',
    '<![if x]\u2009>thin-space marked section',
    '<a href="/mix\u00a0\u205f\t\u200a">ws soup in value</a>',
    'nbsp\u00a0text\u3000wide',
]

WORDS = ["plain", "text", "&amp;", "café", "1<2", "&#65;", "tail&copy;", "x"]


def gen_doc():
    parts = []
    for _ in range(rng.randint(2, 8)):
        if rng.random() < 0.6:
            parts.append(rng.choice(NASTY))
        else:
            parts.append(rng.choice(WORDS))
    return "".join(parts)


def b64(s):
    if isinstance(s, str):
        s = s.encode("utf-8")
    return base64.b64encode(s).decode("ascii")


def main():
    out = os.path.join(VEC, "html_fuzz2.tsv")
    with open(out, "w", encoding="utf-8") as f:
        f.write("name\thtml_b64\tlinks_json_b64\ttext_b64\n")
        # every NASTY construct alone, then 300 random combinations
        docs = [(f"nasty{i:02d}", n) for i, n in enumerate(NASTY)]
        docs += [(f"fz2_{i:03d}", gen_doc()) for i in range(300)]
        for name, doc in docs:
            o = Oracle()
            o.feed(doc)
            o.close()
            f.write("\t".join([
                name, b64(doc), b64(json.dumps(o.links, ensure_ascii=False)),
                b64(o.text.getvalue())]) + "\n")
    print("wrote", out, len(docs), "docs")


if __name__ == "__main__":
    main()
