#!/usr/bin/env python3
"""Golden-fixture generator (SURVEY.md §5.1): executes the reference's own
pure modules (/root/reference/url_scorer.py, deduplicator.py — stdlib-only)
on deterministic synthetic inputs and dumps JSON that the Scala tests
assert byte/na-value parity against. Run:  python3 tools/gen_fixtures.py
Outputs to src/test/resources/fixtures/.
"""
import sys, json, os, itertools

sys.path.insert(0, "/root/reference")
from url_scorer import URLScorer          # noqa: E402
from deduplicator import FacilityDeduplicator, FacilitySignature  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/fixtures")
os.makedirs(OUT, exist_ok=True)

# ---------- URL scoring fixture ----------
BASE = "https://big.example.com/"
URLS = []
hosts = ["big.example.com", "h1.example.com"]
paths = [
    "/", "/locations/", "/locations/city-12/", "/facilities/f-9",
    "/facility/one/", "/communities/c-3/", "/community/x/",
    "/centers/north/", "/find-a-location", "/directory/",
    "/careers/job-1", "/jobs/", "/news/item-7", "/blog/post", "/investors/",
    "/press/", "/media/kit", "/report.pdf", "/file.doc", "/sheet.xlsx",
    "/our-locations/page-2", "/our-communities/", "/our-team/",
    "/about/team-4", "/contact/", "/search?q=care", "/list?page=3",
    "/page/5/", "/a/b/c/d/e/f", "/a/b/c/", "/x",
    "/LOCATIONS/UPPER/", "/Find-Location?Page=2",
]
for h, p in itertools.product(hosts, paths):
    URLS.append(f"https://{h}{p}")

scorer = URLScorer()
rows = []
for u in URLS:
    for base in [None, BASE]:
        score, meta = scorer.score_url(u, base)
        rows.append({"url": u, "base": base, "score": score, "depth": meta["depth"]})
with open(f"{OUT}/url_scores.json", "w") as f:
    json.dump(rows, f, indent=1)
print(f"url_scores.json: {len(rows)} rows")

# ---------- ranking fixture (stable sort semantics) ----------
ranked = scorer.rank_urls(URLS, BASE)
with open(f"{OUT}/url_rank.json", "w") as f:
    json.dump([{"url": u, "score": s} for (u, s, _) in ranked], f, indent=1)
print(f"url_rank.json: {len(ranked)} rows")

# ---------- dedup signature fixture ----------
def fac(i, **kw):
    d = {"name": f"Care Center {i}", "address": f"{100+i} Main St.",
         "city": "Springfield", "state": "KS", "zip_code": f"{10000+i}",
         "phone": f"(620) 364-{2000+i:04d}"}
    d.update(kw)
    return d

FACILITIES = [
    fac(1),
    fac(1),                                        # exact dup
    fac(2),
    fac(2, phone=""),                              # no phone: addr+name fuzzy
    fac(3, name="care center 3!!"),                # punctuation in name
    fac(3, name="Care Center 3"),                  # same after norm
    fac(4, address=""),
    fac(5, city="", zip_code=""),
    fac(6, name="Sunrise Home 6", address="600 Oak Avenue"),
    fac(6, name="Sunrise Hom_ 6", address="600 Oak Avenu_"),  # fuzzy pair
    fac(7, zip_code="10007-1234"),
    fac(7, zip_code="10007"),                      # zip[:5] equal
    fac(8),
    fac(9, name=""),
    fac(10, phone="620.364.2010"),
    fac(10, phone="(620) 364-2010"),               # same digits
]
sig_rows = []
for i, f_ in enumerate(FACILITIES):
    s = FacilitySignature.from_facility(f_)
    sig_rows.append({"idx": i, "facility": f_, "phone_hash": s.phone_hash,
                     "address_hash": s.address_hash, "name_hash": s.name_hash,
                     "full_hash": s.full_hash})
with open(f"{OUT}/dedup_signatures.json", "w") as f:
    json.dump(sig_rows, f, indent=1)
print(f"dedup_signatures.json: {len(sig_rows)} rows")

# ---------- dedup verdict fixture (which survive, in order) ----------
dd = FacilityDeduplicator(threshold=0.85)
unique = dd.deduplicate_facilities(FACILITIES)
with open(f"{OUT}/dedup_survivors.json", "w") as f:
    json.dump({"survivor_idx": [FACILITIES.index(u) for u in unique],
               "stats": dd.get_stats()}, f, indent=1)
print(f"dedup_survivors.json: {len(unique)} survivors of {len(FACILITIES)}")

# ---------- pairwise similarity fixture ----------
pairs = []
dd2 = FacilityDeduplicator(threshold=0.85)
for i in range(len(FACILITIES)):
    for j in range(i + 1, len(FACILITIES)):
        sim = dd2._calculate_similarity(FACILITIES[i], FACILITIES[j])
        pairs.append({"i": i, "j": j, "sim": sim})
with open(f"{OUT}/dedup_similarity.json", "w") as f:
    json.dump(pairs, f, indent=1)
print(f"dedup_similarity.json: {len(pairs)} pairs")
