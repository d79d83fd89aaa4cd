"""Property differential for the PII scrub: texts COMPOSED from planted
PII fragments (valid/invalid cards and IBANs, emails, IPs, SSN/phone
shapes, secrets, digit-heavy noise) run through the Spark operator and
through an INDEPENDENT pure-Python reference (re module + Python Luhn /
mod-97) — a third implementation, so a Java-regex/RE2-subset divergence or
a checksum slip cannot hide behind the shared-source oracle design.
Derandomized like the other property files."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql4pandas_spark.operators.text import PII_PATTERNS

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=25,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_FRAGMENTS = [
    "plain words here",
    "mail bob.smith+x@Example.org now",
    "host 10.0.200.1 up",
    "ssn 123-45-6789",
    "call 555-123-4567",
    "pay 4532015112830366",            # Luhn-valid
    "typo 4532015112830367",           # Luhn-invalid (still redacts)
    "spaced 4111 1111 1111 1111",      # valid with separators
    "iban DE89370400440532013000",     # mod-97-valid
    "bad DE89370400440532013001",      # mod-97-invalid (still redacts)
    "gb GB82WEST12345698765432",       # valid, letters in BBAN
    "key_A7fK2mQ9xP4wL8vB3n leak",
    "hash c0ffee5ca1ab1efacade90d15ea5edeadbeef000",
    "digits 1234567890 and 12-34",     # shapes too short to match
    "deep a.b.c@x.y.zz",
]


def _luhn_ok(cand: str) -> bool:
    digits = [int(c) for c in re.sub(r"[^0-9]", "", cand)][::-1]
    total = 0
    for i, d in enumerate(digits, start=1):
        total += d if i % 2 else (2 * d - 9 * ((2 * d) // 10))
    return total % 10 == 0


def _iban97_ok(cand: str) -> bool:
    rearranged = cand[4:] + cand[:4]
    acc = 0
    for ch in rearranged:
        if ch.isdigit():
            acc = (acc * 10 + (ord(ch) - 48)) % 97
        else:
            acc = (acc * 100 + (ord(ch) - 55)) % 97
    return acc == 1


_VALIDATORS = {"luhn": _luhn_ok, "iban97": _iban97_ok, None: lambda c: True}


def _reference_scrub(text: str) -> tuple[str, dict[str, int]]:
    """Stagewise scrub in pure Python — counts checksum-gated, redaction
    conservative, exactly the operator's documented contract."""
    counts: dict[str, int] = {}
    cur = text
    for name, token, pat, validator in PII_PATTERNS:
        cands = re.findall(pat, cur)
        counts[f"n_{name}"] = sum(
            1 for c in cands if _VALIDATORS[validator](c)
        )
        cur = re.sub(pat, token.replace("\\", "\\\\"), cur)
    return cur, counts


@given(
    st.lists(st.sampled_from(_FRAGMENTS), min_size=1, max_size=6),
    st.sampled_from([" ", "  ", " . ", " and "]),
)
@settings(**_SETTINGS)
def test_pii_scrub_matches_pure_python_reference(spark, frags, sep):
    from sql4pandas_spark.operators.text import pii_scrub

    text = sep.join(frags)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pii_scrub(df).collect()[0]
    ref_text, ref_counts = _reference_scrub(text)
    assert row["text"] == ref_text, f"text={text!r}"
    for name, _, _, _ in PII_PATTERNS:
        assert row[f"n_{name}"] == ref_counts[f"n_{name}"], (
            f"{name} diverged on text={text!r}"
        )
    assert row["n_pii"] == sum(ref_counts.values())


# ---------------- third-implementation differentials for the round-12
# text signals (same rationale as the scrub property above)

_DOMAIN_URLS = [
    "https://News.Site.com/articles/9?id=2",
    "http://spam.bad-ads.net:8080/click",
    "blog.example.org/post",
    "localhost/admin",
    "ftp://a.b.c.d.example.net/x",
    "https://UPPER.CASE.ORG",
    "site.com",
    "no spaces.but/odd",
    "x://weird-scheme.example/",
    "host.name:443/path?q=1#frag",
    # PSL snapshot cases: multi-label suffixes, 3-label longest-match,
    # pure suffixes, hosted platforms, trailing-dot garbage
    "https://Shop.Example.co.uk/basket",
    "http://deep.sub.site.co.uk:80/x",
    "news.com.au/story",
    "https://school.k12.ca.us/",
    "x.k12.ca.us",
    "district.ca.us/page",
    "co.uk",
    "https://k12.ca.us/",
    "myblog.blogspot.com/post",
    "https://user.github.io/repo",
    "bucket.s3.amazonaws.com/key",
    ".co.uk/odd",
    "example.co.uk.",
    # round-14 wildcard/exception rules: *.ck-class wildcards key one
    # level deeper, !-exceptions cancel them, precedence is load-bearing
    "https://store.shop.ck/x",
    "shop.ck",
    "ck",
    "https://www.ck/home",
    "foo.www.ck/page",
    "a.b.www.ck",
    "xwww.ck",
    "www.city.kobe.jp/ward",
    "city.kobe.jp",
    "blog.foo.kobe.jp",
    "foo.kobe.jp",
    "kobe.jp",
    "https://example.gov.bd/forms",
    "deep.sub.example.mm",
    ".x.ck/odd",
    "x..ck",
]


def _py_registered_domain(url: str) -> str | None:
    """Independent label-WALKING implementation of the PSL rule the
    engine expresses as regexes over the bundled snapshot: exception
    rules win outright, wildcard bases key one level deeper (bare
    one-label-plus-base hosts are suffixes → None; malformed empty
    labels fall through like the regexes' ``[^.]+``), then longest
    matching multi-label public suffix plus one label; pure suffix →
    None; last-two-labels fallback otherwise."""
    from sql4pandas_spark.operators.text import (
        PSL_EXCEPTIONS,
        PSL_WILDCARD_BASES,
        PUBLIC_SUFFIXES_MULTI,
    )

    psl = set(PUBLIC_SUFFIXES_MULTI)
    m = re.match(r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?([^/?#:]+)", url.strip())
    host = (m.group(1) if m else "").lower()
    for exc in PSL_EXCEPTIONS:
        if host == exc or host.endswith("." + exc):
            return exc
    for base in PSL_WILDCARD_BASES:
        if host.endswith("." + base):
            rest = host[: -(len(base) + 1)].split(".")
            if len(rest) == 1 and rest[0]:
                return None
            if len(rest) >= 2 and rest[-1] and rest[-2]:
                return ".".join(rest[-2:]) + "." + base
            break
    if host in psl:
        return None
    labels = host.split(".")
    for take in sorted({s.count(".") + 1 for s in psl}, reverse=True):
        if len(labels) >= take + 1:
            suf = ".".join(labels[-take:])
            if suf in psl and all(labels[-(take + 1):]):
                return ".".join(labels[-(take + 1):])
    d = re.search(r"([^.]+\.[^.]+)$", host)
    return d.group(1) if d else None


@given(st.lists(st.sampled_from(_DOMAIN_URLS), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_registered_domain_matches_python_reference(spark, urls):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import registered_domain

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", registered_domain(F.col("url")).alias("d")
        ).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _py_registered_domain(u), f"url={u!r}"


_ENTROPY_TEXTS = [
    "spam spam spam spam",
    "one two three four five",
    "a a b b c",
    "",
    "  ",
    "The THE the tHe",          # casefold collapses
    "x",
    "lorem ipsum dolor sit amet lorem ipsum",
]


def _py_token_entropy(text: str) -> tuple[int, int | None]:
    import math
    from collections import Counter

    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    if n == 0:
        return 0, None
    total = sum(
        int(round(c * math.log(n / c) * 1e6)) for c in Counter(toks).values()
    )
    return n, total // n


@given(st.lists(st.sampled_from(_ENTROPY_TEXTS), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_token_entropy_matches_python_reference(spark, texts):
    from sql4pandas_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in token_entropy(df).collect()}
    for i, t in enumerate(texts):
        n, e = _py_token_entropy(t)
        assert rows[i]["n_tokens"] == n, f"text={t!r}"
        assert rows[i]["entropy_e6"] == e, f"text={t!r}"
