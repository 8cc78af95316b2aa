"""Ingest pipelines: the reference's pre-index row processors as
Catalyst column expressions.

Reference: ``modules/ingest-common/.../IngestCommonModulePlugin.java:91-125``
registers 31 processors applied per document before indexing. Every one
maps to a built-in Spark expression (whole-stage codegen, no Python):

    set, copy, rename, remove, uppercase, lowercase, trim, split, join,
    gsub, substring(=script subset), convert, date, json, kv, csv,
    fingerprint, bytes, urldecode, html_strip, append, drop, fail,
    dissect (regexp_extract), grok (regexp_extract), foreach(transform),
    script, sort, pipeline (nested), dot_expander, date_index_name,
    uri_parts (parse_url)

Pipeline = ordered list of {processor: config}; apply with
``apply_pipeline(df, processors)``. Unknown processors raise.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, functions as F


def _field(cfg: dict) -> str:
    return cfg["field"]


def apply_pipeline(df: DataFrame, processors: List[dict]) -> DataFrame:
    for p in processors:
        ((kind, cfg),) = p.items()
        df = _apply_one(df, kind, cfg)
    return df


def _apply_one(df: DataFrame, kind: str, cfg: dict) -> DataFrame:
    f = cfg.get("field")
    tgt = cfg.get("target_field", f)
    c = F.col(f) if f else None

    if kind == "set":
        return df.withColumn(f, F.lit(cfg["value"]))
    if kind == "copy":
        return df.withColumn(tgt, F.col(cfg["source_field"]))
    if kind == "rename":
        return df.withColumnRenamed(f, cfg["target_field"])
    if kind == "remove":
        fields = cfg["field"] if isinstance(cfg["field"], list) else [cfg["field"]]
        return df.drop(*fields)
    if kind == "uppercase":
        return df.withColumn(tgt, F.upper(c))
    if kind == "lowercase":
        return df.withColumn(tgt, F.lower(c))
    if kind == "trim":
        return df.withColumn(tgt, F.trim(c))
    if kind == "split":
        return df.withColumn(tgt, F.split(c, cfg["separator"]))
    if kind == "join":
        return df.withColumn(tgt, F.concat_ws(cfg["separator"], c))
    if kind == "gsub":
        return df.withColumn(
            tgt, F.regexp_replace(c, cfg["pattern"], cfg["replacement"])
        )
    if kind == "convert":
        t = {"integer": "int", "long": "long", "float": "float",
             "double": "double", "string": "string", "boolean": "boolean"}[
            cfg["type"]
        ]
        return df.withColumn(tgt, c.cast(t))
    if kind == "date":
        fmt = cfg.get("formats", ["yyyy-MM-dd"])[0]
        return df.withColumn(tgt, F.to_timestamp(c, fmt))
    if kind == "json":
        return df.withColumn(tgt, F.from_json(c, cfg["schema"]))
    if kind == "kv":
        fs = cfg.get("field_split", " ")
        vs = cfg.get("value_split", "=")
        return df.withColumn(tgt, F.str_to_map(c, F.lit(fs), F.lit(vs)))
    if kind == "csv":
        names = cfg["target_fields"]
        sep = cfg.get("separator", ",")
        parts = F.split(c, sep)
        for i, name in enumerate(names):
            df = df.withColumn(name, parts.getItem(i))
        return df
    if kind == "fingerprint":
        fields = cfg.get("fields", [f])
        method = cfg.get("method", "SHA-256").upper().replace("-", "")
        cat = F.concat_ws("|", *[F.col(x).cast("string") for x in fields])
        if method in ("SHA256", "SHA1", "SHA512"):
            bits = {"SHA256": 256, "SHA1": 0, "SHA512": 512}[method]
            expr = F.sha1(cat) if method == "SHA1" else F.sha2(cat, bits)
        elif method == "MD5":
            expr = F.md5(cat)
        else:
            expr = F.xxhash64(cat).cast("string")
        return df.withColumn(cfg.get("target_field", "fingerprint"), expr)
    if kind == "bytes":
        # "1kb" -> 1024 etc.
        num = F.regexp_extract(c, r"(?i)^\s*([0-9.]+)", 1).cast("double")
        unit = F.lower(F.regexp_extract(c, r"(?i)([kmgt]?b)\s*$", 1))
        mult = (
            F.when(unit == "kb", 1024.0)
            .when(unit == "mb", 1024.0 ** 2)
            .when(unit == "gb", 1024.0 ** 3)
            .when(unit == "tb", 1024.0 ** 4)
            .otherwise(1.0)
        )
        return df.withColumn(tgt, (num * mult).cast("long"))
    if kind == "urldecode":
        return df.withColumn(tgt, F.url_decode(c))
    if kind == "html_strip":
        return df.withColumn(tgt, F.regexp_replace(c, r"<[^>]*>", ""))
    if kind == "append":
        return df.withColumn(
            tgt, F.concat(F.coalesce(c, F.array()), F.array(F.lit(cfg["value"])))
        )
    if kind == "drop":
        # drop documents matching the condition (SQL expr)
        return df.where(~F.expr(cfg["if"]))
    if kind == "fail":
        # fail the pipeline for matching docs -> surfaced as a filter +
        # count contract at call site; here: raise if any row matches
        n = df.where(F.expr(cfg["if"])).limit(1).count()
        if n:
            raise ValueError(cfg.get("message", "ingest fail condition met"))
        return df
    if kind in ("dissect", "grok"):
        # both compile to regexp extraction; cfg: pattern with ONE group
        # per target field (the Spark-first analog of grok patterns)
        pattern = cfg["pattern"]
        for i, name in enumerate(cfg["target_fields"], start=1):
            df = df.withColumn(name, F.regexp_extract(c, pattern, i))
        return df
    if kind == "foreach":
        # higher-order transform over an array field
        return df.withColumn(tgt, F.expr(
            f"transform({f}, x -> {cfg['lambda']})"
        ))
    if kind == "script":
        return df.withColumn(tgt or cfg["target_field"], F.expr(cfg["source"]))
    if kind == "sort":
        return df.withColumn(
            tgt, F.sort_array(c, asc=cfg.get("order", "asc") != "desc")
        )
    if kind == "pipeline":
        # nested pipeline invocation (PipelineProcessor)
        return apply_pipeline(df, cfg["processors"])
    if kind == "dot_expander":
        # "a.b" flat column -> struct column a{b} (merging with an
        # existing struct is out of scope; one level, like the reference
        # default)
        root, _, leaf = f.partition(".")
        return df.withColumn(root, F.struct(F.col(f"`{f}`").alias(leaf))).drop(f)
    if kind == "date_index_name":
        # date_index_name: route each doc to a time-bucketed index name
        prefix = cfg.get("index_name_prefix", "")
        rounding = {"y": "year", "M": "month", "w": "week", "d": "day",
                    "h": "hour"}.get(cfg.get("date_rounding", "d"), "day")
        fmt = cfg.get("index_name_format", "yyyy-MM-dd")
        return df.withColumn(
            cfg.get("target_field", "_index"),
            F.concat(F.lit(prefix),
                     F.date_format(F.date_trunc(rounding, c), fmt)),
        )
    if kind == "uri_parts":
        # uri_parts: decompose a URL column (parse_url is JVM-side)
        base = cfg.get("target_field", f)
        for part, name in (("HOST", "domain"), ("PATH", "path"),
                           ("QUERY", "query"), ("PROTOCOL", "scheme")):
            df = df.withColumn(f"{base}_{name}", F.parse_url(c, F.lit(part)))
        return df
    if kind == "remove_by_pattern":
        # reference: RemoveByPatternProcessor — drop every column whose
        # name matches a field_pattern. Regex.simpleMatch treats ONLY
        # '*' as a wildcard ('?' and '[' are literal characters), so
        # fnmatch would over-match; translate '*' -> '.*' ourselves.
        import re as _re

        pats = cfg["field_pattern"]
        pats = pats if isinstance(pats, list) else [pats]
        rxs = [_re.compile(".*".join(_re.escape(part)
                                     for part in p.split("*")) + r"\Z")
               for p in pats]
        drop = [col for col in df.columns
                if any(rx.match(col) for rx in rxs)]
        return df.drop(*drop)
    if kind == "community_id":
        # reference: CommunityIdProcessor — Community ID v1 flow hash:
        # '1:' + base64(sha1(seed·saddr·daddr·proto·0·sport·dport))
        # with the (addr, port) endpoint pair canonically ordered.
        # IPv4 + port-carrying transports (tcp/udp/sctp) as pure
        # Catalyst byte-building (hex strings -> unhex -> sha1);
        # verified against the reference's test vectors.
        sip = F.col(cfg.get("source_ip_field", "source_ip"))
        dip = F.col(cfg.get("dest_ip_field", "dest_ip"))
        sport = F.col(cfg.get("source_port_field", "source_port")).cast("int")
        dport = F.col(cfg.get("dest_port_field", "dest_port")).cast("int")
        seed = int(cfg.get("seed", 0))
        proto_map = {"tcp": 6, "udp": 17, "sctp": 132}
        tf = cfg.get("transport_field", "transport")
        proto = F.lower(F.col(tf).cast("string"))
        proto_num = F.coalesce(
            *[F.when(proto == name, F.lit(num))
              for name, num in proto_map.items()],
            F.col(tf).cast("int"),
        )

        def ip_hex(ip):
            o = F.split(ip, r"\.")
            return F.format_string(
                "%02x%02x%02x%02x",
                *[F.element_at(o, i + 1).cast("int") for i in range(4)],
            )

        sh, dh = ip_hex(sip), ip_hex(dip)
        swap = (sh > dh) | ((sh == dh) & (sport > dport))
        a_ip, a_p = F.when(swap, dh).otherwise(sh), F.when(swap, dport).otherwise(sport)
        b_ip, b_p = F.when(swap, sh).otherwise(dh), F.when(swap, sport).otherwise(dport)
        payload = F.concat(
            F.lit(format(seed, "04x")), a_ip, b_ip,
            F.format_string("%02x", proto_num), F.lit("00"),
            F.format_string("%04x", a_p), F.format_string("%04x", b_p),
        )
        return df.withColumn(
            cfg.get("target_field", "community_id"),
            F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(F.unhex(payload))))),
        )
    if kind == "user_agent":
        from opensearch_spark.pipelines.enrich import user_agent

        return user_agent(
            df, cfg["field"],
            target_field=cfg.get("target_field", "user_agent"),
            properties=cfg.get("properties"),
        )
    if kind == "geoip":
        from opensearch_spark.pipelines.enrich import geoip

        return geoip(
            df, cfg["field"], cfg["database"],
            target_field=cfg.get("target_field", "geoip"),
            properties=cfg.get("properties"),
        )
    raise ValueError(f"unknown ingest processor: {kind}")
