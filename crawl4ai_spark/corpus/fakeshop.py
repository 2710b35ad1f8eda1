"""Deterministic synthetic web corpus ("FakeShop").

Blueprint: the reference's dummy-site generator
(/root/reference/tests/general/generate_dummy_site.py:10-13 — 3
categories x 2 subcategories x 5 products, MAX_DEPTH_TARGET=5,
breadcrumbs + child links), extended per FIXTURES.md §2 with
adversarial cases: tracking-param URLs, fragments, relative and ../
links, duplicate links, srcset images, spec tables, external/social
links, an optional hub host holding a large share of links (skew), and
a deterministic 200/404/429/503 status mix.

Everything derives from (site topology params, a fixed seed string) via
hashing — no RNG state, so any slice of the corpus can be regenerated
on any executor.
"""

from __future__ import annotations

import hashlib


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _host(site: int, n_sites: int, hub_share: bool) -> str:
    if hub_share and site == 0:
        return "hub.fakeshop.test"
    return f"shop{site}.fakeshop.test"


def generate_fakeshop(
    n_sites: int = 1,
    n_categories: int = 3,
    n_subcats: int = 2,
    n_products: int = 5,
    hub_share: bool = False,
    error_rate: float = 0.0,
) -> list[dict]:
    """Returns page dicts: url, host, html, status_code, content_type, fetch_ms.

    Tree per site (depth in parens):
      home(0) -> category(1) -> subcategory(2) -> product(3) -> details(4)
    """
    pages: list[dict] = []

    def status_for(url: str) -> int:
        if error_rate <= 0:
            return 200
        r = _h("status:" + url) % 1000
        if r < error_rate * 1000 * 0.4:
            return 404
        if r < error_rate * 1000 * 0.8:
            return 429
        if r < error_rate * 1000:
            return 503
        return 200

    def page(url: str, host: str, html: str) -> None:
        pages.append(
            {
                "url": url,
                "host": host,
                "html": html,
                "status_code": status_for(url),
                "content_type": "text/html",
                "fetch_ms": 20 + _h("lat:" + url) % 180,
            }
        )

    for s in range(n_sites):
        host = _host(s, n_sites, hub_share)
        base = f"http://{host}"

        cat_links = "".join(
            f'<li><a href="/cat-{c}/index.html?utm_source=home">Category {c}</a></li>'
            for c in range(n_categories)
        )
        other_sites = "".join(
            f'<a href="http://{_host((s + d) % n_sites, n_sites, hub_share)}/index.html">peer {d}</a>'
            for d in (1, 2)
            if n_sites > 1
        )
        page(
            f"{base}/index.html",
            host,
            f"""<html><head><title>FakeShop {s} Home</title>
            <meta name="description" content="The number one fake shop, site {s}."></head>
            <body><h1>Welcome to FakeShop {s}</h1>
            <img src="/img/banner-{s}.png" alt="banner {s}" width="800" height="200">
            <p>Browse our categories:</p><ul>{cat_links}</ul>
            <p>Partners: <a href="http://partner.external.test/ref?ref=fs{s}">partner</a>
            {other_sites}</p>
            <p>Social: <a href="http://social.example.net/fakeshop">follow us</a></p>
            </body></html>""",
        )

        for c in range(n_categories):
            sub_links = "".join(
                f'<li><a href="sub-{u}/index.html">Sub {c}.{u}</a></li>'
                for u in range(n_subcats)
            )
            page(
                f"{base}/cat-{c}/index.html",
                host,
                f"""<html><head><title>Category {c}</title></head><body>
                <h2>Category {c}</h2>
                <p><a href="/index.html">Home</a> &gt; Category {c}</p>
                <ul>{sub_links}</ul>
                <a href="/cat-{c}/index.html#top">top</a>
                </body></html>""",
            )

            for u in range(n_subcats):
                prod_links = "".join(
                    f'<li><a href="product_P{s}{c}{u}{p}.html">Product P{s}{c}{u}{p}</a></li>'
                    for p in range(n_products)
                )
                page(
                    f"{base}/cat-{c}/sub-{u}/index.html",
                    host,
                    f"""<html><head><title>Sub {c}.{u}</title></head><body>
                    <h2>Subcategory {c}.{u}</h2>
                    <p><a href="../index.html">Up</a> | <a href="/index.html">Home</a></p>
                    <ul>{prod_links}</ul>
                    <li><a href="product_P{s}{c}{u}0.html">Product P{s}{c}{u}0 (featured)</a></li>
                    </body></html>""",
                )

                for p in range(n_products):
                    pid = f"P{s}{c}{u}{p}"
                    year = 2018 + (_h("y" + pid) % 7)
                    page(
                        f"{base}/cat-{c}/sub-{u}/product_{pid}.html",
                        host,
                        f"""<html><head><title>Product {pid}</title>
                        <meta name="description" content="Details for product {pid}, released {year}."></head>
                        <body><h1>Product {pid}</h1>
                        <p>Released <em>{year}</em>. Price ${(_h('pr' + pid) % 9000) / 100 + 10:.2f}.</p>
                        <img src="/img/{pid}.jpg" alt="{pid} photo" width="400" height="300"
                             srcset="/img/{pid}-2x.jpg 2x">
                        <table summary="specs"><caption>Specs {pid}</caption>
                        <tr><th>Attr</th><th>Value</th></tr>
                        <tr><td>Weight</td><td>{_h('w' + pid) % 20 + 1}kg</td></tr>
                        <tr><td>Year</td><td>{year}</td></tr></table>
                        <p><a href="details/{pid}_details.html?utm_campaign=x&b=2&a=1">Full details</a>
                        <a href="../sub-{u}/index.html">Back</a></p>
                        </body></html>""",
                    )
                    page(
                        f"{base}/cat-{c}/sub-{u}/details/{pid}_details.html?a=1&b=2",
                        host,
                        f"""<html><head><title>{pid} details</title></head><body>
                        <h3>All about {pid}</h3>
                        <video src="/vid/{pid}.mp4" title="{pid} demo"></video>
                        <p>Long-form description of {pid}. Review date {year}-0{1 + _h('m' + pid) % 9}-15.</p>
                        <p><a href="../product_{pid}.html">Product page</a></p>
                        </body></html>""",
                    )
    return pages


def fakeshop_spark_df(spark, **kwargs):
    """Corpus as a Spark DataFrame keyed by canonical URL (url_norm)."""
    import pandas as pd

    from crawl4ai_spark.functions.urlnorm import normalize_url_for_deep_crawl

    rows = generate_fakeshop(**kwargs)
    pdf = pd.DataFrame(rows)
    pdf["url_norm"] = [
        normalize_url_for_deep_crawl(u, u) for u in pdf["url"]
    ]
    return spark.createDataFrame(pdf)
