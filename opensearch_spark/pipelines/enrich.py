"""Enrichment ingest processors: user_agent parsing and geoip lookup.

Reference: ``modules/ingest-user-agent/.../UserAgentProcessor.java:60``
(uap-core regex database) and ``modules/ingest-geoip/.../
GeoIpProcessor.java:72`` (MaxMind binary database).

Spark-first shapes:

- ``user_agent``: the reference evaluates ~1000 uap-core regexes per doc
  in Java. Here a COMPACT, documented pattern subset (the browsers /
  OSes that cover the overwhelming majority of real traffic) compiles to
  one chain of Catalyst ``regexp_extract`` / ``when`` expressions —
  whole-stage codegen, no Python, no per-row loop. Divergence from the
  full uap-core device database is documented; the schema and precedence
  rules (Edge before Chrome, Chrome before Safari, Android before Linux)
  match the reference's output fields.

- ``geoip``: the reference memory-maps a MaxMind ``.mmdb`` (not
  shippable here). The Spark-native equivalent takes the lookup table AS
  A DATAFRAME of ranges (ip_from, ip_to, props...) — the shape GeoLite2
  CSVs actually ship in. A naive range join would be a broadcast
  nested-loop (3M ranges x N docs); instead ``prepare_geoip_table``
  explodes each range into the /16 blocks it covers, so the lookup is a
  broadcast EQUI-join on the doc IP's /16 prefix plus a residual BETWEEN
  filter — the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --------------------------------------------------------------------------
# user_agent

_V = r"(\d+)(?:\.(\d+))?(?:\.(\d+))?"

# (name, detect-pattern, version-pattern) in PRECEDENCE order: more
# specific tokens first (Edge/Opera carry 'Chrome/', Chrome carries
# 'Safari/')
_BROWSERS = [
    ("Edge", r"Edge?/|Edg/", r"Edge?/" + _V + r"|Edg/" + _V),
    ("Opera", r"OPR/|Opera/", r"OPR/" + _V + r"|Opera/" + _V),
    ("Chrome Mobile", r"Chrome/.*Mobile", r"Chrome/" + _V),
    ("Chrome", r"Chrome/", r"Chrome/" + _V),
    ("Firefox", r"Firefox/", r"Firefox/" + _V),
    ("Mobile Safari", r"Version/.*Mobile.*Safari/", r"Version/" + _V),
    ("Safari", r"Version/.*Safari/", r"Version/" + _V),
    ("IE", r"MSIE |Trident/", r"MSIE " + _V + r"|rv:" + _V),
]

_OSES = [
    ("Windows", r"Windows NT", r"Windows NT " + _V),
    ("Android", r"Android", r"Android " + _V),
    ("iOS", r"iPhone OS |CPU OS ", r"OS (\d+)(?:_(\d+))?(?:_(\d+))?"),
    ("Mac OS X", r"Mac OS X", r"Mac OS X (\d+)(?:[._](\d+))?(?:[._](\d+))?"),
    ("Chrome OS", r"CrOS", r"CrOS [a-z0-9_]+ " + _V),
    ("Linux", r"Linux", ""),
]


def _first_group(c: Column, pattern: str, n_alts: int) -> Column:
    """regexp_extract of the FIRST non-empty capture group across the
    pattern's alternatives (each alternative contributes 3 groups)."""
    outs = [F.regexp_extract(c, pattern, i + 1) for i in range(3 * n_alts)]
    return F.coalesce(*[F.when(o != "", o) for o in outs], F.lit(""))


def user_agent_cols(c: Column) -> dict[str, Column]:
    """The parsed columns for one user-agent string column."""
    name = F.lit("Other")
    major = F.lit("")
    for nm, detect, verpat in reversed(_BROWSERS):
        n_alts = verpat.count("|") + 1 if verpat else 0
        hit = c.rlike(detect)
        name = F.when(hit, F.lit(nm)).otherwise(name)
        if verpat:
            major = F.when(hit, _first_group(c, verpat, n_alts)).otherwise(major)
    os_name = F.lit("Other")
    os_major = F.lit("")
    for nm, detect, verpat in reversed(_OSES):
        hit = c.rlike(detect)
        os_name = F.when(hit, F.lit(nm)).otherwise(os_name)
        if verpat:
            os_major = F.when(
                hit, F.regexp_extract(c, verpat, 1)).otherwise(os_major)
    # Windows NT kernel versions -> marketing names (uap-core os
    # replacement rules: NT 6.1 is "Windows 7", not "Windows 6")
    nt = F.regexp_extract(c, r"Windows NT (\d+\.\d+)", 1)
    win = (F.when(nt == "10.0", "10").when(nt == "6.3", "8.1")
           .when(nt == "6.2", "8").when(nt == "6.1", "7")
           .when(nt == "6.0", "Vista").when(nt == "5.1", "XP")
           .otherwise(nt))
    os_major = F.when(os_name == "Windows", win).otherwise(os_major)
    device = (
        F.when(c.rlike(r"iPad|Tablet"), "Tablet")
        .when(c.rlike(r"Mobi|iPhone|Android.*Mobile"), "Mobile")
        .otherwise("Other")
    )
    return {
        "name": name,
        "major": major,
        "os": F.when(os_major != "", F.concat(os_name, F.lit(" "), os_major))
                .otherwise(os_name),
        "os_name": os_name,
        "os_major": os_major,
        "device": device,
        "original": c,
    }


def user_agent(df: DataFrame, field: str,
               target_field: str = "user_agent",
               properties: list[str] | None = None) -> DataFrame:
    """`user_agent` ingest processor (reference: UserAgentProcessor.java:60):
    parse ``field`` and add ``<target_field>_<prop>`` columns. Default
    properties mirror the reference's (name, major, os, os_name,
    os_major, device, original)."""
    cols = user_agent_cols(F.col(field))
    props = properties or list(cols)
    unknown = set(props) - set(cols)
    if unknown:
        raise ValueError(f"unknown user_agent properties: {sorted(unknown)}")
    return df.withColumns({f"{target_field}_{p}": cols[p] for p in props})


# --------------------------------------------------------------------------
# geoip

def ip_to_long(c: Column) -> Column:
    """Dotted-quad IPv4 -> uint32 as a long (pure Catalyst)."""
    o = F.split(c, r"\.")
    return sum(
        F.element_at(o, i + 1).cast("long") * F.lit(1 << (8 * (3 - i)))
        for i in range(4)
    )


def prepare_geoip_table(db: DataFrame, ip_from: str = "ip_from",
                        ip_to: str = "ip_to") -> DataFrame:
    """Explode each [ip_from, ip_to] range (dotted-quad strings,
    inclusive) into the /16 blocks it covers, keyed by ``prefix16`` =
    ip >> 16. GeoLite2-size inputs (~3M ranges) explode to < 10M rows —
    still broadcastable — and the per-doc lookup becomes an equi-join
    instead of a nested-loop range join."""
    lo, hi = ip_to_long(F.col(ip_from)), ip_to_long(F.col(ip_to))
    return (
        db.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .withColumn(
            "prefix16",
            F.explode(F.sequence(
                F.shiftright("_lo", 16), F.shiftright("_hi", 16))),
        )
    )


def geoip(df: DataFrame, field: str, database: DataFrame,
          target_field: str = "geoip",
          properties: list[str] | None = None) -> DataFrame:
    """`geoip` ingest processor (reference: GeoIpProcessor.java:72) over
    a range-table database prepared by :func:`prepare_geoip_table`
    (pass the raw range frame and it is prepared on the fly). Adds
    ``<target_field>_<prop>`` for every database property column (or the
    ``properties`` subset). Docs whose IP matches no range get nulls,
    like the reference's missing-address behavior."""
    if "prefix16" not in database.columns:
        database = prepare_geoip_table(database)
    props = properties or [
        c for c in database.columns
        if c not in ("ip_from", "ip_to", "_lo", "_hi", "prefix16")
    ]
    ipnum = ip_to_long(F.col(field))
    db = database.select(
        "prefix16", "_lo", "_hi",
        *[F.col(p).alias(f"{target_field}_{p}") for p in props],
    )
    out = df.withColumn("_ipnum", ipnum).withColumn(
        "_prefix16", F.shiftright("_ipnum", 16)
    )
    joined = out.join(
        F.broadcast(db),
        (out["_prefix16"] == db["prefix16"])
        & (F.col("_ipnum") >= db["_lo"]) & (F.col("_ipnum") <= db["_hi"]),
        "left",
    )
    return joined.drop("_ipnum", "_prefix16", "prefix16", "_lo", "_hi")
