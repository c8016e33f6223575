"""Deterministic synthetic site mirror (FIXTURES.md §3). No network.

Replays the shape of the reference's crawl surface:

- listing pages: the AJAX JSON shape ``{foster_list: [...], page: {now,
  all_page, rows}}`` (comprehensive_scraper.py:274-278), ~22 cats/page
  (comprehensive_scraper.py:299);
- profile pages: small HTML with a title/description/detail structure and
  an image + outlink mix exercising every selector class the reference
  cascades over (comprehensive_scraper.py:163-174, config.py selector
  cascade) and the ``/foster/\\d+/`` outlink regex
  (smart_cat_discovery.py:138);
- image URLs: status-200 rows with media content types;
- seeded failures: ~1% of profile URLs 404 (dead-letter path).

One host dominates (~90% of URLs — the single-site skew case) plus a
tail of image hosts. Everything is a pure function of (seed, ids), so
the sequential oracle and the Spark engine read identical content.
"""

from __future__ import annotations

import hashlib
import json
import random
from dataclasses import dataclass, field

MAIN_HOST = "mirror-main.test"
BASE_URL = f"https://{MAIN_HOST}"
TAIL_HOSTS = ["img-cdn-a.test", "img-cdn-b.test", "img-cdn-c.test"]

CAT_NAMES = [
    "ミケ", "タマ", "クロ", "シロ", "トラ", "モモ", "ハナ", "ソラ",
    "Luna", "Milo", "Leo", "Momo-chan", "Kuro&Shiro", "ちゃとら",
]
CATCH_COPIES = [
    "甘えん坊の男の子です", "人懐っこい美猫", "元気いっぱい子猫",
    "おっとり性格のキジトラ", "Sweet shy tabby", "遊ぶの大好き!",
]
DETAIL_KEYS = ["年齢", "性別", "ワクチン", "毛色", "Area", "Status"]
DETAIL_VALUES = {
    "年齢": ["2歳", "6ヶ月", "推定3歳", "1歳半"],
    "性別": ["オス", "メス"],
    "ワクチン": ["接種済み", "未接種"],
    "毛色": ["キジトラ", "黒", "白", "三毛"],
    "Area": ["Tokyo", "Osaka", "Kyoto"],
    "Status": ["募集中", "トライアル中"],
}


def _rng(seed: int, *keys) -> random.Random:
    h = hashlib.md5(("|".join(map(str, (seed, *keys)))).encode()).hexdigest()
    return random.Random(int(h[:15], 16))


@dataclass
class Mirror:
    seed: int
    n_pages: int
    cats_per_page: int
    pages: dict[str, dict] = field(default_factory=dict)  # url -> page row
    listing_urls: list[str] = field(default_factory=list)
    profile_ids: list[int] = field(default_factory=list)

    def rows(self) -> list[dict]:
        return list(self.pages.values())


def listing_url(page_num: int) -> str:
    return f"{BASE_URL}/foster/cat/contents/?p={page_num}"


def profile_path(cat_id: int) -> str:
    return f"/foster/{cat_id}/"


def _cat_ids_for_page(seed: int, page_num: int, cats_per_page: int) -> list[int]:
    # ids in the reference's observed range (smart_cat_discovery.py:161-167)
    start = 226400 + (page_num - 1) * cats_per_page
    return list(range(start, start + cats_per_page))


def _listing_body(seed: int, page_num: int, n_pages: int, cats_per_page: int) -> str:
    foster_list = []
    for cat_id in _cat_ids_for_page(seed, page_num, cats_per_page):
        r = _rng(seed, "cat", cat_id)
        foster_list.append(
            {
                "cat_id": cat_id,
                "cat_name": r.choice(CAT_NAMES),
                "catch_copy": r.choice(CATCH_COPIES),
                "url": profile_path(cat_id),
                "image_1": f"/img/cat_{cat_id}_main.jpg",
            }
        )
    return json.dumps(
        {
            "foster_list": foster_list,
            "page": {
                "now": page_num,
                "all_page": n_pages,
                "rows": n_pages * cats_per_page,
            },
        },
        ensure_ascii=False,
    )


def _profile_body(
    seed: int,
    cat_id: int,
    id_lo: int,
    id_hi: int,
    rich: bool = False,
) -> str:
    """HTML exercising the selector cascade. Containers hold only <img>
    tags (flat nesting) so both the DOM oracle and the vectorized regex
    extractor parse them identically. Pure function of scalars so page
    generation itself can run distributed (bench-scale mirrors).
    ``rich`` fattens the page (more images/links/details) for the
    scaling bench."""
    r = _rng(seed, "profile", cat_id)
    name = r.choice(CAT_NAMES)
    title_tag = r.choice(["h1", "h2", "h3"])
    title_cls = r.choice(["cat-title", "name-header", "page-title"])
    desc_tag = r.choice(["div", "p"])
    desc_cls = r.choice(["description", "desc-main", "content-body"])
    desc = r.choice(CATCH_COPIES) + f" (id {cat_id})"

    parts = [
        "<html><body>",
        f'<{title_tag} class="{title_cls}">{name}</{title_tag}>',
        f'<{desc_tag} class="{desc_cls}">{desc}</{desc_tag}>',
    ]

    # detail key:value blocks (smart_cat_discovery.py:238-243).
    # rich mode approximates real page weight (the test default is a
    # minimal page; production HTML runs 50-200 KB)
    n_details = r.randint(2, 5) if not rich else r.randint(20, 40)
    keys = [DETAIL_KEYS[r.randrange(len(DETAIL_KEYS))] for _ in range(n_details)]
    for k in keys:
        v = r.choice(DETAIL_VALUES[k])
        tag = r.choice(["div", "span"])
        cls = r.choice(["detail-item", "info-row", "attribute"])
        parts.append(f'<{tag} class="{cls}">{k}: {v}</{tag}>')
    # a detail block without a colon — must be ignored
    parts.append('<div class="detail-note">no separator here</div>')

    # image mix
    gallery_imgs = []
    n_gallery = r.randint(1, 4) if not rich else r.randint(24, 48)
    for i in range(1, n_gallery + 1):
        gallery_imgs.append(f'<img src="/img/cat_{cat_id}_g{i}.jpg" alt="g{i}">')
    if r.random() < 0.5:
        # lazy-loaded: no src, only data-src -> matched only via container
        gallery_imgs.append(f'<img data-src="/img/cat_{cat_id}_lazy.webp" alt="lazy">')
    parts.append('<div class="gallery">' + "".join(gallery_imgs) + "</div>")

    if r.random() < 0.6:
        host = r.choice(TAIL_HOSTS)
        parts.append(
            f'<div class="photo"><img src="https://{host}/media/foster_{cat_id}_x.png" alt="cdn"></div>'
        )
    # bare imgs matched by attribute selectors only
    parts.append(f'<img src="/img/cat_{cat_id}_main.jpg" alt="dup-of-api">')
    if r.random() < 0.4:
        parts.append(f'<img src="/files/photo_{cat_id}.jpeg" alt="ext-only">')
    # junk: extension-bearing logo is KEPT by the reference's interest
    # filter (comprehensive_scraper.py:184-187 keeps any .png); a
    # no-extension, no-keyword img is dropped
    parts.append('<img src="/static/site_logo.png" alt="logo">')
    parts.append('<img src="/static/spacer" alt="spacer">')

    # outlinks (/foster/\d+/ regex, smart_cat_discovery.py:138) —
    # targets sampled arithmetically from the id range (pure function)
    n_links = r.randint(1, 3) if not rich else r.randint(12, 24)
    for _ in range(n_links):
        lid = id_lo + r.randrange(max(1, id_hi - id_lo))
        parts.append(f'<a href="/foster/{lid}/">related cat {lid}</a>')
    if r.random() < 0.5:
        lid = id_lo + r.randrange(max(1, id_hi - id_lo))
        parts.append(
            '<div class="related-cats">'
            f'<a href="/foster/{lid}/">similar {lid}</a>'
            "</div>"
        )
    parts.append('<a href="/about/">about us</a>')  # non-matching link
    parts.append("</body></html>")
    return "\n".join(parts)


def build_mirror(
    seed: int = 42,
    n_pages: int = 5,
    cats_per_page: int = 22,
    fail_rate: float = 0.01,
) -> Mirror:
    m = Mirror(seed=seed, n_pages=n_pages, cats_per_page=cats_per_page)
    all_ids: list[int] = []
    for p in range(1, n_pages + 1):
        all_ids.extend(_cat_ids_for_page(seed, p, cats_per_page))
    m.profile_ids = all_ids

    for p in range(1, n_pages + 1):
        url = listing_url(p)
        m.listing_urls.append(url)
        m.pages[url] = {
            "url": url,
            "kind": "listing",
            "status_code": 200,
            "content_type": "application/json",
            "body": _listing_body(seed, p, n_pages, cats_per_page),
        }

    id_lo, id_hi = all_ids[0], all_ids[-1] + 1
    for cat_id in all_ids:
        url = f"{BASE_URL}{profile_path(cat_id)}"
        r = _rng(seed, "fail", cat_id)
        if r.random() < fail_rate:
            m.pages[url] = {
                "url": url,
                "kind": "profile",
                "status_code": 404,
                "content_type": "text/html",
                "body": None,
            }
        else:
            m.pages[url] = {
                "url": url,
                "kind": "profile",
                "status_code": 200,
                "content_type": "text/html",
                "body": _profile_body(seed, cat_id, id_lo, id_hi),
            }

    # every image URL referenced anywhere resolves 200 with a media type
    for row in list(m.pages.values()):
        if row["kind"] == "profile" and row["body"]:
            pass  # image URLs are resolved lazily by lookup_page below
    return m


_IMAGE_CT = {"jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
             "webp": "image/webp", "gif": "image/gif"}


def lookup_page(mirror: Mirror, url: str) -> dict:
    """Fetch semantics of the mirror: known page, or a derived image
    response for any media-looking URL, else 404."""
    if url in mirror.pages:
        return mirror.pages[url]
    lower = url.lower()
    for ext, ct in _IMAGE_CT.items():
        if lower.endswith("." + ext):
            return {
                "url": url,
                "kind": "image",
                "status_code": 200,
                "content_type": ct,
                "body": None,
            }
    return {
        "url": url,
        "kind": "missing",
        "status_code": 404,
        "content_type": "text/html",
        "body": None,
    }


def spark_bench_mirror(
    spark,
    out_dir: str,
    n_pages: int = 2500,
    cats_per_page: int = 22,
    seed: int = 42,
    rich: bool = True,
):
    """Bench-scale mirror written as parquet, with page-body generation
    DISTRIBUTED over executors (mapInPandas over the id range) — the
    driver never holds the corpus. Listing bodies (tiny) are built
    driver-side. Returns the parquet path."""
    import pandas as pd
    from pyspark.sql import functions as F

    listing_rows = [
        {
            "url": listing_url(p),
            "kind": "listing",
            "status_code": 200,
            "content_type": "application/json",
            "body": _listing_body(seed, p, n_pages, cats_per_page),
        }
        for p in range(1, n_pages + 1)
    ]
    listings = spark.createDataFrame(pd.DataFrame(listing_rows))

    id_lo = 226400
    id_hi = id_lo + n_pages * cats_per_page

    def _gen(it):
        for pdf in it:
            rows = []
            for cat_id in pdf["id"]:
                cat_id = int(cat_id)
                r = _rng(seed, "fail", cat_id)
                if r.random() < 0.01:
                    rows.append(
                        (f"{BASE_URL}{profile_path(cat_id)}", "profile", 404, "text/html", None)
                    )
                else:
                    rows.append(
                        (
                            f"{BASE_URL}{profile_path(cat_id)}",
                            "profile",
                            200,
                            "text/html",
                            _profile_body(seed, cat_id, id_lo, id_hi, rich=rich),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "kind", "status_code", "content_type", "body"]
            )

    profiles = (
        spark.range(id_lo, id_hi)
        .repartition(max(spark.sparkContext.defaultParallelism * 2, 8))
        .mapInPandas(
            _gen,
            schema="url string, kind string, status_code int, content_type string, body string",
        )
    )
    listings.select("url", "kind", "status_code", "content_type", "body").unionByName(
        profiles
    ).write.mode("overwrite").parquet(out_dir)
    return out_dir


def host_budget_rows(max_per_epoch: int = 200, min_delay_ms: int = 10) -> list[dict]:
    hosts = [MAIN_HOST, *TAIL_HOSTS]
    return [
        {"host": h, "max_per_epoch": max_per_epoch, "min_delay_ms": min_delay_ms}
        for h in hosts
    ]
