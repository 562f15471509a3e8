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

# ---------- schema-selection fixture ----------
# schema_based_extractor.py cannot be imported (crawl4ai dependency +
# the :646 syntax error), so the pure selection logic
# (get_best_schema :302-327, _matches_pattern :329-332,
# _analyze_html_compatibility :334-366) is transcribed here verbatim and
# run on synthetic pages; the Scala SchemaSelect must reproduce the
# (name, score, via) triples exactly.
import fnmatch, re as _re

SCHEMAS = [  # (name, site_patterns, baseSelector, field selectors) :43-300
    ("standard_facility_listing",
     ["*facility*", "*location*", "*community*", "*center*"],
     ".facility-card, .location-card, .community-card, .center-card",
     ["h1, h2, h3, .facility-name, .location-name, .community-name",
      ".address, .location, .street-address, [itemprop='streetAddress']",
      ".city, [itemprop='addressLocality']",
      ".state, [itemprop='addressRegion']",
      ".zip, .postal-code, [itemprop='postalCode']",
      ".phone, .telephone, [itemprop='telephone'], a[href^='tel:']",
      "a[href*='http'], .website-link, .facility-link",
      ".facility-type, .care-type, .service-type",
      ".services li, .amenities li, .care-services li"]),
    ("table_facility_listing", ["*table*", "*directory*", "*list*"],
     "table tr, .facility-table tr, .location-table tr",
     ["td:first-child, .facility-name, .name-column",
      "td:nth-child(2), .address-column",
      "td:nth-child(3), .phone-column, a[href^='tel:']",
      "td:nth-child(4), .type-column"]),
    ("individual_facility_detail",
     ["*facility/*", "*location/*", "*community/*"],
     "body, .facility-details, .location-details",
     ["h1, .facility-name, .page-title",
      ".address, .contact-info .address, [itemprop='streetAddress']",
      ".city, [itemprop='addressLocality']",
      ".state, [itemprop='addressRegion']",
      ".zip, [itemprop='postalCode']",
      ".phone, [itemprop='telephone'], a[href^='tel:']",
      ".email, a[href^='mailto:']",
      ".administrator, .director, .manager",
      ".beds, .capacity, .bed-count",
      ".services li, .amenities li, .features li",
      ".description, .about, .overview"]),
    ("sunrise_senior_living", ["*sunriseseniorliving.com*"],
     ".community-card, .location-result",
     [".community-name, h3", ".address-line-1", ".address-line-2",
      ".phone-number, a[href^='tel:']", ".care-types li, .services li"]),
    ("lcca_state_listing", ["*lcca.com/locations/*"], ".facCard",
     [".facName h2", ".facAddress", "span[itemprop='addressLocality']",
      "span[itemprop='addressRegion']", "span[itemprop='postalCode']",
      "a[href^='tel:']", "a.btnMainCTA", ".serviceType li:first-child",
      ".serviceType li"]),
]

def _compat(html, base_selector, field_selectors):
    score = 0; total = 0
    for selector in base_selector.split(", "):
        if "." in selector:
            class_name = selector.split(".")[1].split(" ")[0]
            if class_name in html: score += 1
        elif "#" in selector:
            id_name = selector.split("#")[1].split(" ")[0]
            if f'id="{id_name}"' in html: score += 1
        total += 1
    for selector in field_selectors:
        if "." in selector:
            for class_name in _re.findall(r'\.([a-zA-Z0-9_-]+)', selector):
                if class_name in html: score += 0.5
                total += 1
    return score / max(total, 1)

def best_schema(url, html):
    for name, pats, _, _ in SCHEMAS:
        for p in pats:
            if fnmatch.fnmatch(url.lower(), p.lower()):
                return name, None, "url"
    best, best_score = None, 0
    for name, _, base, fields in SCHEMAS:
        s = _compat(html, base, fields)
        if s > best_score:
            best_score, best = s, name
    if best and best_score > 0.3:
        return best, round(best_score, 6), "html"
    return None, None, None

SCHEMA_PAGES = [
    # url glob wins regardless of html
    ("https://www.lcca.com/locations/kansas/", "<html><body>nothing</body></html>"),
    ("https://x.example.com/our-table-of-things", "<html></html>"),
    # facCard page behind a non-glob url → html scoring
    ("https://x.example.com/page-a",
     '<div class="facCard"><div class="facName"><h2>A</h2></div>'
     '<div class="facAddress">1 Main</div><ul class="serviceType"><li>SNF</li></ul></div>'),
    # standard cards
    ("https://y.example.com/page-b",
     '<div class="facility-card"><span class="facility-name">N</span>'
     '<span class="address">1 Main</span><span class="city">C</span>'
     '<span class="state">KS</span><span class="zip">11111</span>'
     '<span class="phone">555</span><ul class="services"><li>x</li></ul></div>'),
    # sunrise-shaped page
    ("https://z.example.com/page-c",
     '<div class="community-card"><span class="community-name">S</span>'
     '<span class="address-line-1">1</span><span class="address-line-2">2</span>'
     '<span class="phone-number">5</span><ul class="care-types"><li>AL</li></ul></div>'),
    # nothing matches → below threshold
    ("https://q.example.com/page-d", "<html><body><p>plain</p></body></html>"),
    # detail-ish page
    ("https://q.example.com/page-e",
     '<div class="facility-details"><h1 class="page-title">T</h1>'
     '<span class="address">1 Main</span><span class="beds">12 beds</span>'
     '<span class="administrator">Dr. A</span><div class="description">d</div></div>'),
]
srows = []
for u, h in SCHEMA_PAGES:
    name, score, via = best_schema(u, h)
    srows.append({"url": u, "html": h, "schema_name": name,
                  "schema_score": score, "schema_via": via})
with open(f"{OUT}/schema_select.json", "w") as f:
    json.dump(srows, f, indent=1)
print(f"schema_select.json: {len(srows)} rows")

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
