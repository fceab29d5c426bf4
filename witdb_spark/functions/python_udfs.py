"""Tier-4 functions: Arrow-batched Python UDFs for Trino functions that
need a real library or algorithm Spark SQL can't express (SURVEY.md §2.9
gaps). Everything here is off the hot path — these are scalar library
functions, not operators — and every UDF body is self-contained (stdlib
imports inside the function: executors can't import witdb_spark).

  - normalize(s, form)        reference StringFunctions.java `normalize`
                              (ICU in the reference; Python unicodedata
                              implements the same Unicode normal forms)
  - word_stem(s)              reference WordStemFunction.java (Lucene
                              snowball; here a faithful pure-Python Porter
                              stemmer — same family, en only)
  - combinations(arr, n)      reference ArrayCombinationsFunction.java
  - hmac_md5/sha1/sha256/sha512  reference HmacFunctions.java (Python hmac)
  - json_exists/json_value/json_query  SQL/JSON-2016 (reference
                              scalar/json/Json*Function.java) over a lax
                              JSONPath subset: $, .name, [idx], [*]
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def _normalize_udf():
    @pandas_udf("string")
    def unicode_normalize(s, form):
        import unicodedata

        import pandas as pd

        def go(v, f):
            if v is None:
                return None
            return unicodedata.normalize((f or "NFC").upper(), v)

        return pd.Series([go(v, f) for v, f in zip(s, form)])

    return unicode_normalize


def _word_stem_udf():
    @pandas_udf("string")
    def word_stem(s):
        import pandas as pd

        # Porter (1980) stemmer, standard algorithm, pure python.
        vowels = "aeiou"

        def cons(w, i):
            c = w[i]
            if c in vowels:
                return False
            if c == "y":
                return i == 0 or not cons(w, i - 1)
            return True

        def measure(w):
            # number of VC sequences in [C](VC){m}[V]
            m, i, n = 0, 0, len(w)
            while i < n and cons(w, i):
                i += 1
            while i < n:
                while i < n and not cons(w, i):
                    i += 1
                if i >= n:
                    break
                m += 1
                while i < n and cons(w, i):
                    i += 1
            return m

        def has_vowel(w):
            return any(not cons(w, i) for i in range(len(w)))

        def double_cons(w):
            return len(w) >= 2 and w[-1] == w[-2] and cons(w, len(w) - 1)

        def cvc(w):
            return (
                len(w) >= 3
                and cons(w, len(w) - 3)
                and not cons(w, len(w) - 2)
                and cons(w, len(w) - 1)
                and w[-1] not in "wxy"
            )

        def step1(w):
            if w.endswith("sses"):
                w = w[:-2]
            elif w.endswith("ies"):
                w = w[:-2]
            elif w.endswith("ss"):
                pass
            elif w.endswith("s"):
                w = w[:-1]
            flag = False
            if w.endswith("eed"):
                if measure(w[:-3]) > 0:
                    w = w[:-1]
            elif w.endswith("ed") and has_vowel(w[:-2]):
                w, flag = w[:-2], True
            elif w.endswith("ing") and has_vowel(w[:-3]):
                w, flag = w[:-3], True
            if flag:
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                elif double_cons(w) and w[-1] not in "lsz":
                    w = w[:-1]
                elif measure(w) == 1 and cvc(w):
                    w += "e"
            if w.endswith("y") and has_vowel(w[:-1]):
                w = w[:-1] + "i"
            return w

        s2 = [
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
            ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
            ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
            ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
            ("biliti", "ble"),
        ]
        s3 = [
            ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
            ("ical", "ic"), ("ful", ""), ("ness", ""),
        ]
        s4 = [
            "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
            "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
        ]

        def rules(w, pairs, minm):
            for suf, rep in pairs:
                if w.endswith(suf):
                    stem = w[: len(w) - len(suf)]
                    if measure(stem) > minm:
                        return stem + rep
                    return w
            return w

        def step4(w):
            for suf in s4:
                if w.endswith(suf):
                    stem = w[: len(w) - len(suf)]
                    if measure(stem) > 1:
                        return stem
                    return w
            if w.endswith("ion") and measure(w[:-3]) > 1 and w[:-3] and w[-4] in "st":
                return w[:-3]
            return w

        def step5(w):
            if w.endswith("e"):
                m = measure(w[:-1])
                if m > 1 or (m == 1 and not cvc(w[:-1])):
                    w = w[:-1]
            if double_cons(w) and w[-1] == "l" and measure(w) > 1:
                w = w[:-1]
            return w

        def stem(word):
            if word is None:
                return None
            w = word.lower()
            if len(w) <= 2:
                return w
            return step5(step4(rules(rules(step1(w), s2, 0), s3, 0)))

        return pd.Series([stem(v) for v in s])

    return word_stem


def _combinations_udf():
    @pandas_udf("array<array<string>>")
    def combinations(arr, n):
        import itertools

        import pandas as pd

        def go(a, k):
            if a is None or k is None:
                return None
            k = int(k)
            if k < 0 or k > len(a):
                return []
            return [list(c) for c in itertools.combinations(list(a), k)]

        return pd.Series([go(a, k) for a, k in zip(arr, n)])

    return combinations


def _hmac_udf(algo: str):
    @pandas_udf("binary")
    def hmac_fn(data, key):
        import hashlib
        import hmac as hmac_mod

        import pandas as pd

        def go(d, k):
            if d is None or k is None:
                return None
            return hmac_mod.new(bytes(k), bytes(d), getattr(hashlib, algo)).digest()

        return pd.Series([go(d, k) for d, k in zip(data, key)])

    return hmac_fn


# --- SQL/JSON 2016: shared lax JSONPath evaluator source, exec'd inside
# each UDF so the closure ships no module references. Path subset:
# $            root
# .name        member access
# [i]          array index (0-based, per SQL/JSON)
# [*]          array wildcard (fans out)
_JSONPATH_SRC = r'''
import json, re

_TOK = re.compile(
    r"\.\.(?P<rec>[A-Za-z_][A-Za-z_0-9]*)"
    r"|\.(?P<star>\*)"
    r"|\.(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|\[(?P<s>\d*)\s*:\s*(?P<e>\d*)\]"
    r"|\[(?P<idx>\d+)\]"
    r"|\[\*\]"
    r"|\.\"(?P<q>[^\"]+)\""
    r"|\s*\?\s*\(\s*@\.(?P<fkey>[A-Za-z_][A-Za-z_0-9]*)\s*"
    r"(?:(?P<fop>==|!=|>=|<=|>|<)\s*(?P<fval>[^)]+?))?\s*\)"
)


def _descend(nd, key, out):
    if isinstance(nd, dict):
        for k, v in nd.items():
            if k == key:
                out.append(v)
            _descend(v, key, out)
    elif isinstance(nd, list):
        for v in nd:
            _descend(v, key, out)


def _lit(text):
    # Known limit: the filter tokenizer stops a literal at the first ')',
    # so string literals containing ')' are not representable in ?(...).
    t = text.strip()
    if t.startswith("'") and t.endswith("'"):
        return t[1:-1]
    try:
        return json.loads(t)
    except Exception:
        return None


def _cmp(a, op, b):
    if op in ("==", "!="):
        # bool never equals non-bool, on EITHER side (1 == true is false,
        # true == 1 is false) — JSON-path equality is type-strict.
        if (type(a) is bool) != (type(b) is bool):
            eq = False
        elif type(a) is bool:
            eq = a is b
        else:
            eq = a == b
        return eq if op == "==" else not eq
    # ordering: numbers with numbers, strings with strings
    num = lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)
    if num(a) and num(b):
        pass
    elif isinstance(a, str) and isinstance(b, str):
        pass
    else:
        return False
    return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]


def jpath(doc, path):
    """SQL/JSON path subset (reference core/trino-main/.../json/ path IR):
    [lax|strict] $ .name ."quoted" .* ..name [i] [s:e] [*] ? (@.k op lit).
    Lax mode: missing members/indexes yield no matches; strict mode makes
    a missing structural step an error (-> None, i.e. NULL ON ERROR).
    Returns the list of matches, or None on malformed json/path/error."""
    if doc is None or path is None:
        return None
    try:
        node = json.loads(doc)
    except Exception:
        return None
    p = path.strip()
    strict = False
    low = p.lower()
    if low.startswith("lax "):
        p = p[4:].lstrip()
    elif low.startswith("strict "):
        strict = True
        p = p[7:].lstrip()
    if not p.startswith("$"):
        return None
    cur, i = [node], 1
    while i < len(p):
        m = _TOK.match(p, i)
        if not m:
            return None
        g = m.groupdict()
        nxt = []
        for nd in cur:
            if g["rec"] is not None:
                _descend(nd, g["rec"], nxt)
            elif g["star"] is not None:
                if isinstance(nd, dict):
                    nxt.extend(nd.values())
                elif strict:
                    return None
            elif g["name"] is not None or g["q"] is not None:
                k = g["name"] if g["name"] is not None else g["q"]
                if isinstance(nd, dict) and k in nd:
                    nxt.append(nd[k])
                elif strict:
                    return None
            elif g["idx"] is not None:
                j = int(g["idx"])
                if isinstance(nd, list) and j < len(nd):
                    nxt.append(nd[j])
                elif strict:
                    return None
            elif g["s"] is not None:
                if isinstance(nd, list):
                    s = int(g["s"]) if g["s"] else 0
                    e = int(g["e"]) if g["e"] else len(nd)
                    nxt.extend(nd[s:e])
                elif strict:
                    return None
            elif g["fkey"] is not None:
                k, op, val = g["fkey"], g["fop"], g["fval"]
                if isinstance(nd, dict) and k in nd:
                    if op is None:
                        nxt.append(nd)
                    elif _cmp(nd[k], op, _lit(val)):
                        nxt.append(nd)
            else:  # [*]
                if isinstance(nd, list):
                    nxt.extend(nd)
                elif strict:
                    return None
        cur, i = nxt, m.end()
    return cur
'''


def _json_udfs():
    @pandas_udf("boolean")
    def json_exists(doc, path):
        import pandas as pd

        ns: dict = {}
        exec(_JSONPATH_SRC, ns)
        jp = ns["jpath"]

        def go(d, p):
            r = jp(d, p)
            return None if r is None else len(r) > 0

        return pd.Series([go(d, p) for d, p in zip(doc, path)])

    @pandas_udf("string")
    def json_value(doc, path):
        import json

        import pandas as pd

        ns: dict = {}
        exec(_JSONPATH_SRC, ns)
        jp = ns["jpath"]

        def go(d, p):
            r = jp(d, p)
            if not r:
                return None
            v = r[0]
            if isinstance(v, (dict, list)):
                return None  # json_value returns scalars only (SQL/JSON)
            if isinstance(v, bool):
                return "true" if v else "false"
            return v if isinstance(v, str) else json.dumps(v)

        return pd.Series([go(d, p) for d, p in zip(doc, path)])

    @pandas_udf("string")
    def json_query(doc, path):
        import json

        import pandas as pd

        ns: dict = {}
        exec(_JSONPATH_SRC, ns)
        jp = ns["jpath"]

        def go(d, p):
            r = jp(d, p)
            if not r:
                return None
            if len(r) == 1:  # WITHOUT ARRAY WRAPPER default
                return json.dumps(r[0], separators=(",", ":"))
            return json.dumps(r, separators=(",", ":"))

        return pd.Series([go(d, p) for d, p in zip(doc, path)])

    return json_exists, json_value, json_query


def _human_readable_seconds_udf():
    @pandas_udf("string")
    def human_readable_seconds(d):
        import pandas as pd

        # reference operator/scalar/timestamp/HumanReadableSeconds.java:
        # round |seconds|, decompose into weeks/days/hours/minutes/seconds,
        # join non-zero parts with ", ", singular/plural unit names.
        def go(v):
            if v is None:
                return None
            secs = round(abs(v))
            parts = []
            for unit, size in (
                ("week", 604800),
                ("day", 86400),
                ("hour", 3600),
                ("minute", 60),
                ("second", 1),
            ):
                n, secs = divmod(secs, size)
                if n:
                    parts.append(f"{n} {unit}{'s' if n != 1 else ''}")
            return ", ".join(parts) if parts else "0 seconds"

        return pd.Series([go(v) for v in d])

    return human_readable_seconds


def _base32_udfs():
    @pandas_udf("string")
    def to_base32(b):
        import base64

        import pandas as pd

        return pd.Series(
            [None if v is None else base64.b32encode(bytes(v)).decode() for v in b]
        )

    @pandas_udf("binary")
    def from_base32(s):
        import base64

        import pandas as pd

        return pd.Series(
            [None if v is None else base64.b32decode(v) for v in s]
        )

    return to_base32, from_base32


def _binary_codec_udfs():
    """Big-endian and IEEE-754 pack/unpack (reference
    VarbinaryFunctions.java to/from_big_endian_32/64, to/from_ieee754_*)."""
    from pyspark.sql.functions import pandas_udf as _p

    def packer(fmt, out_type, cast=None):
        @_p(out_type)
        def pack(x):
            import struct

            import pandas as pd

            def go(v):
                if v is None:
                    return None
                return struct.pack(fmt, cast(v) if cast else v)

            return pd.Series([go(v) for v in x])

        return pack

    def unpacker(fmt, out_type, post=None):
        @_p(out_type)
        def unpack(b):
            import struct

            import pandas as pd

            def go(v):
                if v is None:
                    return None
                r = struct.unpack(fmt, bytes(v))[0]
                return post(r) if post else r

            return pd.Series([go(v) for v in b])

        return unpack

    return {
        "to_big_endian_32": packer(">i", "binary", int),
        "from_big_endian_32": unpacker(">i", "int"),
        "to_big_endian_64": packer(">q", "binary", int),
        "from_big_endian_64": unpacker(">q", "bigint"),
        "to_ieee754_32": packer(">f", "binary", float),
        "from_ieee754_32": unpacker(">f", "double", float),
        "to_ieee754_64": packer(">d", "binary", float),
        "from_ieee754_64": unpacker(">d", "double"),
    }


def _ip_contains_udf():
    @pandas_udf("boolean")
    def ip_contains(network, address):
        import ipaddress

        import pandas as pd

        # reference IpAddressFunctions.contains(varchar, ipaddress);
        # registered as ip_contains because this engine dispatches by name
        # and `contains` is taken by the array form.
        def go(n, a):
            if n is None or a is None:
                return None
            return ipaddress.ip_address(a) in ipaddress.ip_network(n, strict=False)

        return pd.Series([go(n, a) for n, a in zip(network, address)])

    return ip_contains


# Normal distribution pair (reference MathFunctions.java normalCdf:674 /
# inverseNormalCdf:663): cdf is 0.5*(1+erf(.)) over stdlib math.erf;
# the inverse seeds a rational approximation (Peter Acklam's public
# algorithm) and polishes with two Halley steps on math.erf, giving
# full double accuracy like the reference's commons-math Erf.erfInv.
_NORM_SRC = r'''
import math


def normal_cdf(mean, sd, value):
    if not sd > 0:
        raise ValueError("standardDeviation must be > 0")
    return 0.5 * (1 + math.erf((value - mean) / (sd * math.sqrt(2))))


_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)


def _norm_ppf(p):
    """Acklam's rational approximation to the standard normal quantile."""
    if p < 0.02425:
        q = math.sqrt(-2 * math.log(p))
        return (((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4])
                * q + _C[5]) / ((((_D[0] * q + _D[1]) * q + _D[2]) * q
                                 + _D[3]) * q + 1)
    if p > 1 - 0.02425:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q
                  + _C[4]) * q + _C[5]) / ((((_D[0] * q + _D[1]) * q
                                             + _D[2]) * q + _D[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4])
            * r + _A[5]) * q / (((((_B[0] * r + _B[1]) * r + _B[2]) * r
                                  + _B[3]) * r + _B[4]) * r + 1)


def inverse_normal_cdf(mean, sd, p):
    if not (0 < p < 1):
        raise ValueError("p must be 0 > p > 1")
    if not sd > 0:
        raise ValueError("sd must be > 0")
    x = _norm_ppf(p)
    # two Halley iterations against the exact cdf drive the residual to
    # the last ulp
    for _ in range(2):
        e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
        u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
        x = x - u / (1 + x * u / 2)
    return mean + sd * x
'''


def _normal_udfs():
    @pandas_udf("double")
    def normal_cdf(mean, sd, value):
        import pandas as pd

        ns: dict = {}
        exec(_NORM_SRC, ns)
        f = ns["normal_cdf"]
        return pd.Series(
            [
                None
                if any(v is None for v in (m, s, x))
                else f(float(m), float(s), float(x))
                for m, s, x in zip(mean, sd, value)
            ]
        )

    @pandas_udf("double")
    def inverse_normal_cdf(mean, sd, p):
        import pandas as pd

        ns: dict = {}
        exec(_NORM_SRC, ns)
        f = ns["inverse_normal_cdf"]
        return pd.Series(
            [
                None
                if any(v is None for v in (m, s, x))
                else f(float(m), float(s), float(x))
                for m, s, x in zip(mean, sd, p)
            ]
        )

    return normal_cdf, inverse_normal_cdf


# MurmurHash3 x64_128 and SpookyHash V2 — both public-domain algorithms
# (Austin Appleby's smhasher; Bob Jenkins' spooky.cc). Byte orders match
# the reference (VarbinaryFunctions.java:371 murmur3 emits the two
# little-endian state longs; :389/:399 spooky_hash_v2_32/64 emit the
# big-endian int/long), validated against TestVarbinaryFunctions
# vectors in tests/test_python_udfs.py.
_HASH_SRC = r'''
import struct

M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data, seed=0):
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h1 = h2 = seed
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & M64
        h1 = (h1 * 5 + 0x52DCE729) & M64
        k2 = (k2 * c2) & M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & M64
        h2 = (h2 * 5 + 0x38495AB5) & M64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if len(tail) > 8:
        k2 = (k2 * c2) & M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    return struct.pack("<QQ", h1, h2)


_SC = 0xDEADBEEFDEADBEEF


def _short_mix(a, b, c, d):
    c = _rotl(c, 50); c = (c + d) & M64; a ^= c
    d = _rotl(d, 52); d = (d + a) & M64; b ^= d
    a = _rotl(a, 30); a = (a + b) & M64; c ^= a
    b = _rotl(b, 41); b = (b + c) & M64; d ^= b
    c = _rotl(c, 54); c = (c + d) & M64; a ^= c
    d = _rotl(d, 48); d = (d + a) & M64; b ^= d
    a = _rotl(a, 38); a = (a + b) & M64; c ^= a
    b = _rotl(b, 37); b = (b + c) & M64; d ^= b
    c = _rotl(c, 62); c = (c + d) & M64; a ^= c
    d = _rotl(d, 34); d = (d + a) & M64; b ^= d
    a = _rotl(a, 5);  a = (a + b) & M64; c ^= a
    b = _rotl(b, 36); b = (b + c) & M64; d ^= b
    return a, b, c, d


def _short_end(a, b, c, d):
    d ^= c; c = _rotl(c, 15); d = (d + c) & M64
    a ^= d; d = _rotl(d, 52); a = (a + d) & M64
    b ^= a; a = _rotl(a, 26); b = (b + a) & M64
    c ^= b; b = _rotl(b, 51); c = (c + b) & M64
    d ^= c; c = _rotl(c, 28); d = (d + c) & M64
    a ^= d; d = _rotl(d, 9);  a = (a + d) & M64
    b ^= a; a = _rotl(a, 47); b = (b + a) & M64
    c ^= b; b = _rotl(b, 54); c = (c + b) & M64
    d ^= c; c = _rotl(c, 32); d = (d + c) & M64
    a ^= d; d = _rotl(d, 25); a = (a + d) & M64
    b ^= a; a = _rotl(a, 63); b = (b + a) & M64
    return a, b, c, d


def _spooky_short(data, seed1, seed2):
    length = len(data)
    remainder = length % 32
    a, b, c, d = seed1, seed2, _SC, _SC
    pos = 0
    if length > 15:
        for _ in range(length // 32):
            x0, x1, x2, x3 = struct.unpack_from("<QQQQ", data, pos)
            c = (c + x0) & M64
            d = (d + x1) & M64
            a, b, c, d = _short_mix(a, b, c, d)
            a = (a + x2) & M64
            b = (b + x3) & M64
            pos += 32
        if remainder >= 16:
            x0, x1 = struct.unpack_from("<QQ", data, pos)
            c = (c + x0) & M64
            d = (d + x1) & M64
            a, b, c, d = _short_mix(a, b, c, d)
            pos += 16
            remainder -= 16
    d = (d + (length << 56)) & M64
    t = data[pos:]
    if remainder >= 12:
        if remainder == 15:
            d = (d + (t[14] << 48)) & M64
        if remainder >= 14:
            d = (d + (t[13] << 40)) & M64
        if remainder >= 13:
            d = (d + (t[12] << 32)) & M64
        d = (d + struct.unpack_from("<I", t, 8)[0]) & M64
        c = (c + struct.unpack_from("<Q", t, 0)[0]) & M64
    elif remainder >= 8:
        if remainder == 11:
            d = (d + (t[10] << 16)) & M64
        if remainder >= 10:
            d = (d + (t[9] << 8)) & M64
        if remainder >= 9:
            d = (d + t[8]) & M64
        c = (c + struct.unpack_from("<Q", t, 0)[0]) & M64
    elif remainder >= 4:
        if remainder == 7:
            c = (c + (t[6] << 48)) & M64
        if remainder >= 6:
            c = (c + (t[5] << 40)) & M64
        if remainder >= 5:
            c = (c + (t[4] << 32)) & M64
        c = (c + struct.unpack_from("<I", t, 0)[0]) & M64
    elif remainder >= 1:
        if remainder == 3:
            c = (c + (t[2] << 16)) & M64
        if remainder >= 2:
            c = (c + (t[1] << 8)) & M64
        c = (c + t[0]) & M64
    else:
        c = (c + _SC) & M64
        d = (d + _SC) & M64
    a, b, c, d = _short_end(a, b, c, d)
    return a, b


def _spooky_mix(x, h):
    for i in range(12):
        h[i] = (h[i] + x[i]) & M64
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rotl(h[i], (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)[i])
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & M64
    return h


def _spooky_end_partial(h):
    for i in range(12):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & M64
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rotl(
            h[(i + 1) % 12],
            (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)[i],
        )
    return h


def spooky_hash128(data, seed1=0, seed2=0):
    length = len(data)
    if length < 192:
        return _spooky_short(data, seed1, seed2)
    h = [seed1, seed2, _SC] * 4
    pos = 0
    nblocks = length // 96
    for _ in range(nblocks):
        x = struct.unpack_from("<12Q", data, pos)
        h = _spooky_mix(x, h)
        pos += 96
    remainder = length - pos
    buf = bytearray(96)
    buf[:remainder] = data[pos:]
    buf[95] = remainder
    x = struct.unpack_from("<12Q", bytes(buf), 0)
    for i in range(12):
        h[i] = (h[i] + x[i]) & M64
    h = _spooky_end_partial(h)
    h = _spooky_end_partial(h)
    h = _spooky_end_partial(h)
    return h[0], h[1]
'''


def _hash_udfs():
    @pandas_udf("binary")
    def murmur3(b):
        import pandas as pd

        ns: dict = {}
        exec(_HASH_SRC, ns)
        f = ns["murmur3_x64_128"]
        return pd.Series([None if v is None else f(bytes(v)) for v in b])

    @pandas_udf("binary")
    def spooky_hash_v2_64(b):
        import struct

        import pandas as pd

        ns: dict = {}
        exec(_HASH_SRC, ns)
        f = ns["spooky_hash128"]
        return pd.Series(
            [
                None if v is None else struct.pack(">Q", f(bytes(v))[0])
                for v in b
            ]
        )

    @pandas_udf("binary")
    def spooky_hash_v2_32(b):
        import struct

        import pandas as pd

        ns: dict = {}
        exec(_HASH_SRC, ns)
        f = ns["spooky_hash128"]
        return pd.Series(
            [
                None
                if v is None
                else struct.pack(">I", f(bytes(v))[0] & 0xFFFFFFFF)
                for v in b
            ]
        )

    return murmur3, spooky_hash_v2_32, spooky_hash_v2_64


# Terminal color functions (reference ColorFunctions.java: color values
# are BIGINTs — nonnegative packed 0xRRGGBB, or -(index+1) for the 8 ANSI
# system colors; render/bar emit ESC[38;5;<n>m sequences).
_COLOR_SRC = r'''
import colorsys

SYSTEM = {"black": 0, "red": 1, "green": 2, "yellow": 3, "blue": 4,
          "magenta": 5, "cyan": 6, "white": 7}
RESET = "\x1b[0m"


def parse_color(text):
    t = text.strip()
    if len(t) == 4 and t[0] == "#":
        try:
            r, g, b = (int(ch, 16) for ch in t[1:])
        except ValueError:
            r = g = b = None
        if r is not None:
            return ((r << 4 | r) << 16) | ((g << 4 | g) << 8) | (b << 4 | b)
    idx = SYSTEM.get(t.lower())
    if idx is None:
        raise ValueError("Invalid color: '%s'" % text)
    return -(idx + 1)


def interpolate(fraction, low_rgb, high_rgb):
    if low_rgb < 0 or high_rgb < 0:
        raise ValueError("lowColor/highColor not a valid RGB color")
    fraction = max(0.0, min(1.0, fraction))
    lo = colorsys.rgb_to_hsv(
        (low_rgb >> 16 & 255) / 255.0,
        (low_rgb >> 8 & 255) / 255.0,
        (low_rgb & 255) / 255.0,
    )
    hi = colorsys.rgb_to_hsv(
        (high_rgb >> 16 & 255) / 255.0,
        (high_rgb >> 8 & 255) / 255.0,
        (high_rgb & 255) / 255.0,
    )
    h, s, v = (fraction * (b - a) + a for a, b in zip(lo, hi))
    r, g, b = colorsys.hsv_to_rgb(h, s, v)
    return (
        (int(r * 255.0 + 0.5) << 16)
        | (int(g * 255.0 + 0.5) << 8)
        | int(b * 255.0 + 0.5)
    )


def to_ansi(color):
    if color >= 0:
        r = (color >> 16 & 255) * 6 // 256
        g = (color >> 8 & 255) * 6 // 256
        b = (color & 255) * 6 // 256
        return 16 + r * 36 + g * 6 + b
    return -color - 1


def render(value, color):
    return "\x1b[38;5;%dm%s%s" % (to_ansi(color), value, RESET)


def bar(percent, width, low_rgb, high_rgb):
    count = int(percent * width)
    count = max(0, min(width, count))
    out = []
    for i in range(count):
        # width 1: Java's float 0f/0 is NaN (renders low color after the
        # min/max clamp); Python int division would raise instead
        frac = i * 1.0 / (width - 1) if width > 1 else 0.0
        out.append("\x1b[38;5;%dm█" % to_ansi(interpolate(frac, low_rgb, high_rgb)))
    out.append(RESET)
    out.append(" " * (width - count))
    return "".join(out)
'''


def _color_udfs():
    @pandas_udf("long")
    def color(s):
        import pandas as pd

        ns: dict = {}
        exec(_COLOR_SRC, ns)
        f = ns["parse_color"]
        return pd.Series([None if v is None else f(v) for v in s])

    @pandas_udf("long")
    def color_interp(frac, lo, hi):
        import pandas as pd

        ns: dict = {}
        exec(_COLOR_SRC, ns)
        f = ns["interpolate"]
        return pd.Series(
            [
                None
                if any(v is None for v in (a, b, c))
                else f(float(a), int(b), int(c))
                for a, b, c in zip(frac, lo, hi)
            ]
        )

    @pandas_udf("string")
    def render(value, col):
        import pandas as pd

        ns: dict = {}
        exec(_COLOR_SRC, ns)
        f = ns["render"]
        return pd.Series(
            [
                None if v is None or c is None else f(v, int(c))
                for v, c in zip(value, col)
            ]
        )

    @pandas_udf("string")
    def bar(percent, width, lo, hi):
        import pandas as pd

        ns: dict = {}
        exec(_COLOR_SRC, ns)
        f = ns["bar"]
        return pd.Series(
            [
                None
                if any(v is None for v in (p, w, a, b))
                else f(float(p), int(w), int(a), int(b))
                for p, w, a, b in zip(percent, width, lo, hi)
            ]
        )

    return color, color_interp, render, bar


def register_python_udfs(spark: SparkSession) -> int:
    """Register the Python-tier functions; returns how many."""
    fns = {
        "normalize": _normalize_udf(),
        "word_stem": _word_stem_udf(),
        "combinations": _combinations_udf(),
        "hmac_md5": _hmac_udf("md5"),
        "hmac_sha1": _hmac_udf("sha1"),
        "hmac_sha256": _hmac_udf("sha256"),
        "hmac_sha512": _hmac_udf("sha512"),
        "human_readable_seconds": _human_readable_seconds_udf(),
        "ip_contains": _ip_contains_udf(),
    }
    tb32, fb32 = _base32_udfs()
    fns.update({"to_base32": tb32, "from_base32": fb32})
    fns.update(_binary_codec_udfs())
    je, jv, jq = _json_udfs()
    fns.update({"json_exists": je, "json_value": jv, "json_query": jq})
    bc, ibc = _beta_udfs()
    fns.update({"beta_cdf": bc, "inverse_beta_cdf": ibc})
    nc, inc = _normal_udfs()
    fns.update({"normal_cdf": nc, "inverse_normal_cdf": inc})
    mm, sp32, sp64 = _hash_udfs()
    fns.update(
        {
            "murmur3": mm,
            "spooky_hash_v2_32": sp32,
            "spooky_hash_v2_64": sp64,
        }
    )
    col, ci, rend, barfn = _color_udfs()
    fns.update(
        {"color": col, "color_interp": ci, "render": rend, "bar": barfn}
    )
    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return len(fns)


# Regularized incomplete beta via the Lentz continued-fraction method (the
# standard textbook algorithm); double precision, ~1e-14 accurate.
_BETA_SRC = r'''
import math

def _betacf(a, b, x):
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h

def beta_cdf(a, b, x):
    if a is None or b is None or x is None:
        return None
    if a <= 0 or b <= 0:
        return float("nan")
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lnbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lnbeta)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b

def inverse_beta_cdf(a, b, p):
    if a is None or b is None or p is None:
        return None
    # reference MathFunctions.inverseBetaCdf: a, b must be > 0 and p in
    # [0, 1] — error, never a silently-clamped 0
    if a <= 0.0 or b <= 0.0:
        raise ValueError("inverse_beta_cdf: a and b must be > 0")
    if p < 0.0 or p > 1.0:
        raise ValueError("inverse_beta_cdf: p must be in [0, 1]")
    if p == 0.0:
        return 0.0
    if p == 1.0:
        return 1.0
    lo, hi = 0.0, 1.0
    for _ in range(100):  # bisection: deterministic, 2^-100 interval
        mid = (lo + hi) / 2.0
        if beta_cdf(a, b, mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0
'''


def _beta_udfs():
    @pandas_udf("double")
    def beta_cdf(a, b, x):
        import pandas as pd

        ns: dict = {}
        exec(_BETA_SRC, ns)
        f = ns["beta_cdf"]
        return pd.Series([f(ai, bi, xi) for ai, bi, xi in zip(a, b, x)])

    @pandas_udf("double")
    def inverse_beta_cdf(a, b, p):
        import pandas as pd

        ns: dict = {}
        exec(_BETA_SRC, ns)
        f = ns["inverse_beta_cdf"]
        return pd.Series([f(ai, bi, pi) for ai, bi, pi in zip(a, b, p)])

    return beta_cdf, inverse_beta_cdf
