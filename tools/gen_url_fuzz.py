#!/usr/bin/env python3
"""Aggressive randomized (base, href) differential vectors for the urllib
port (seed 7, deterministic). Covers grammar my hand-picked vectors don't:
percent-encoding, unicode, empty/odd schemes, multiple slashes, userinfo,
brackets-free IPv6-ish text, queries/fragments in weird spots.
Output: src/test/resources/vectors/url_fuzz.tsv (same columns as url_join.tsv).
"""
import base64
import os
import random
from urllib.parse import urljoin, urlparse

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VEC = os.path.join(ROOT, "src/test/resources/vectors")

rng = random.Random(7)

SCHEMES = ["http", "https", "HTTP", "hTtPs", "ftp", "ws", "file", "mailto",
           "javascript", "data", "a+b-c.d", ""]
HOSTS = ["example.com", "EXAMPLE.com", "sub.example.com:8080", "a.b.c.example.com",
         "user:pw@example.com", "example.com:443", "xn--caf-dma.example",
         "localhost", "127.0.0.1:9000", ""]
PATH_SEGS = ["a", "b", "..", ".", "p;x=1", "q%20r", "%2F", "ünïcode", "~user",
             "a b", "", "...", "s;p1;p2", "UPPER",
             # WHATWG-sanitize territory: urlsplit lstrips C0-or-space and
             # removes every tab/CR/LF; NBSP/NEL are NOT stripped
             "a\tb", "c\rd", "e\nf", "\x0bg", "\x85h", "\u00a0i", "\x00j"]
QUERIES = ["", "?a=1&b=2", "?a=%26&b=%3D", "??", "?dup=1&dup=2", "?;semi",
           "?q=val#notfrag", "?"]
FRAGS = ["", "#f", "#a#b", "#%20", "#?q"]


def rand_path():
    n = rng.randint(0, 4)
    segs = [rng.choice(PATH_SEGS) for _ in range(n)]
    lead = rng.choice(["/", "", "//", "/./", "/../"])
    return lead + "/".join(segs) + rng.choice(["", "/", "//"])


def rand_abs():
    s = rng.choice(SCHEMES)
    h = rng.choice(HOSTS)
    p = rand_path()
    q = rng.choice(QUERIES).split("#")[0] if rng.random() < 0.7 else ""
    f = rng.choice(FRAGS) if rng.random() < 0.5 else ""
    if s in ("mailto", "javascript", "data"):
        return f"{s}:payload{rng.randint(0,9)}"
    if s == "":
        return ("//" + h if rng.random() < 0.5 else "") + p + q + f
    return f"{s}://{h}{p}{q}{f}"


def rand_href():
    r = rng.random()
    if r < 0.35:
        return rand_abs()
    if r < 0.55:
        return rand_path() + rng.choice(QUERIES) + rng.choice(FRAGS)
    if r < 0.7:
        return "/".join(rng.choice(PATH_SEGS) for _ in range(rng.randint(1, 4)))
    if r < 0.8:
        return rng.choice(QUERIES) + rng.choice(FRAGS)
    if r < 0.9:
        return "//" + rng.choice(HOSTS) + rand_path()
    return rng.choice(["", "#", "?", ".", "..", "/", ";x", "c:\\win",
                       " lead", "a\tb", ":8080/odd", "////quad",
                       "\thttp://tab.lead/x", "\x0c lead", "ht\ntp://split.it/",
                       " \t\r\n mix", "\x1f\x7f ctl"])


def b64(s):
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


def main():
    rows = []
    while len(rows) < 3000:
        base = rand_abs()
        href = rand_href()
        try:
            joined = urljoin(base, href)
            p = urlparse(joined)
            keep = p.scheme in ("http", "https")
            if keep:
                clean = f"{p.scheme}://{p.netloc}{p.path}"
                if p.query:
                    clean += f"?{p.query}"
                nl = urlparse(clean).netloc
                ind = nl.endswith("example.com")
            else:
                clean, nl, ind = "", "", False
        except Exception:
            continue  # urllib raised (e.g. invalid IPv6) — out of contract
        rows.append("\t".join([
            b64(base), b64(href), b64(joined), p.scheme,
            str(keep).lower(), b64(clean), b64(nl), str(ind).lower()]))
    with open(os.path.join(VEC, "url_fuzz.tsv"), "w") as f:
        f.write("base_b64\thref_b64\tjoined_b64\tscheme\tkeep\tclean_b64\tnetloc_b64\tin_domain\n")
        f.write("\n".join(rows) + "\n")
    print("wrote", len(rows), "fuzz vectors")


if __name__ == "__main__":
    main()
