"""Fixed schemas for every engine table (SURVEY.md §1.3).

The reference keeps dynamic dict-shaped records (info.json with open
keys, schemaless progress/report JSON — comprehensive_scraper.py:211-219,
smart_cat_discovery.py:238-243); here everything is a fixed columnar
schema so Catalyst can prune/pushdown, with the open key:value details
mapped to MapType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# input contract (BASELINE.json input_hint): interleaved text+media docs
# ---------------------------------------------------------------------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # title|description|detail|image|link
        T.StructField("text", T.StringType(), True),   # NULL for kind='image'
        T.StructField("media_ref", T.StringType(), True),  # NULL for text kinds
        T.StructField("offset", T.IntegerType(), False),  # 0-based discovery order
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# ---------------------------------------------------------------------------
# crawl state tables (replace the reference's in-memory sets + JSON files,
# comprehensive_scraper.py:62-96, smart_cat_discovery.py:41-71)
# ---------------------------------------------------------------------------
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(canonical url)
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.LongType(), False),  # discovery sequence within depth
        T.StructField("epoch", T.IntegerType(), False),  # epoch discovered
        T.StructField("status", T.StringType(), False),  # pending|fetched|failed
        # listing-row image_1 carried to the profile's span extraction
        # (prepend rule, comprehensive_scraper.py:196-203)
        T.StructField("api_image_1", T.StringType(), True),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), False),
    ]
)

FETCH_LOG = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("seq_in_host", T.LongType(), False),   # politeness order within (host, epoch)
        T.StructField("scheduled_ms", T.LongType(), False),  # virtual politeness schedule
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("host_shard", T.IntegerType(), False),
        T.StructField("urls_in", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# synthetic site mirror (replaces the network; FIXTURES.md §3)
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # listing|profile|image
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("body", T.StringType(), True),  # JSON/HTML text; None for non-200
    ]
)

# ---------------------------------------------------------------------------
# media metadata (per-file PIL/YOLO facts from advanced_cleaning.py:96-126,
# aggressive_cleaning.py:84-136, yolo_cat_detector.py:87-130)
# ---------------------------------------------------------------------------
DETECTION = T.StructType(
    [
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("bbox", T.ArrayType(T.DoubleType()), False),
    ]
)

IMAGES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("image_idx", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("alpha_max", T.IntegerType(), True),
        T.StructField("top_color_ratio", T.DoubleType(), True),
        T.StructField("warm_ratio", T.DoubleType(), True),
        T.StructField("md5", T.StringType(), True),
        T.StructField("detections", T.ArrayType(DETECTION), True),
    ]
)

# S8: downloaded media blobs as an opaque-binary column with typed
# metadata (the reference writes image files to disk,
# comprehensive_scraper.py:233-259; here the 'directory of images' is a
# committed columnar table the multimodal operators read directly)
MEDIA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

CAT_INFO = T.StructType(
    [
        T.StructField("cat_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("catch_copy", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("details", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("scraped_at", T.TimestampType(), True),
    ]
)

HOST_BUDGET = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("max_per_epoch", T.IntegerType(), False),
        T.StructField("min_delay_ms", T.LongType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)
