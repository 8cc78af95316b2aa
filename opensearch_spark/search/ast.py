"""Query AST — the engine's intermediate representation.

Mirrors the reference's QueryBuilder tree (SURVEY.md §3.1 step 1:
``index/query/AbstractQueryBuilder.java``) as plain dataclasses. The DSL
parser (dsl.py) produces these; the engine compiles them to DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Union


@dataclass
class Node:
    boost: float = 1.0


@dataclass
class Match(Node):
    """Full-text match (reference: MatchQueryBuilder, default operator OR)."""
    field_name: str = ""
    query: str = ""
    operator: str = "or"            # "or" | "and"
    minimum_should_match: int = 0   # int form only (v1)
    zero_terms_query: str = "none"  # "none" | "all"


@dataclass
class MatchPhrase(Node):
    field_name: str = ""
    query: str = ""
    slop: int = 0                   # v1 supports slop=0 (exact adjacency)


@dataclass
class Bool(Node):
    must: List["AnyNode"] = field(default_factory=list)
    filter: List["AnyNode"] = field(default_factory=list)
    should: List["AnyNode"] = field(default_factory=list)
    must_not: List["AnyNode"] = field(default_factory=list)
    minimum_should_match: Optional[int] = None

    def effective_msm(self) -> int:
        if self.minimum_should_match is not None:
            return self.minimum_should_match
        # reference default: >=1 should must match only when there is no
        # must/filter context (BoolQueryBuilder semantics)
        if self.should and not self.must and not self.filter:
            return 1
        return 0


@dataclass
class TermQ(Node):
    field_name: str = ""
    value: Any = None


@dataclass
class TermsQ(Node):
    """terms query; ``lookup`` = {"id": docId, "path": column} fetches
    the value list from another document at query time (reference:
    TermsQueryBuilder terms-lookup / TermsLookup.java)."""
    field_name: str = ""
    values: List[Any] = field(default_factory=list)
    lookup: Any = None


@dataclass
class RangeQ(Node):
    field_name: str = ""
    gte: Any = None
    gt: Any = None
    lte: Any = None
    lt: Any = None


@dataclass
class GeoDistanceQ(Node):
    """geo_distance query (reference: index/query/
    GeoDistanceQueryBuilder.java) — points within ``distance_m`` meters
    of (lat, lon); filter context, constant score."""
    field_name: str = ""
    lat: float = 0.0
    lon: float = 0.0
    distance_m: float = 0.0


@dataclass
class GeoBoundingBoxQ(Node):
    """geo_bounding_box query (GeoBoundingBoxQueryBuilder.java)."""
    field_name: str = ""
    top: float = 0.0
    left: float = 0.0
    bottom: float = 0.0
    right: float = 0.0


@dataclass
class GeoPolygonQ(Node):
    """geo_polygon query (reference: index/query/
    GeoPolygonQueryBuilder.java) — points inside the polygon given as
    a closed-or-open ring of (lat, lon) vertices; filter context.
    Membership is even-odd ray casting, unrolled per edge into plain
    Catalyst arithmetic (the polygon is a query-time literal)."""
    field_name: str = ""
    points: List[tuple] = field(default_factory=list)  # [(lat, lon), ...]


@dataclass
class Exists(Node):
    field_name: str = ""


@dataclass
class Ids(Node):
    values: List[int] = field(default_factory=list)


@dataclass
class MatchAll(Node):
    pass


@dataclass
class MatchNone(Node):
    pass


@dataclass
class ConstantScore(Node):
    filter: Optional["AnyNode"] = None


@dataclass
class DisMax(Node):
    queries: List["AnyNode"] = field(default_factory=list)
    tie_breaker: float = 0.0


@dataclass
class Prefix(Node):
    """Multi-term query over the term dictionary; constant-score rewrite
    (the reference's default for prefix/wildcard/regexp/fuzzy)."""
    field_name: str = ""
    value: str = ""
    max_expansions: int = 50


@dataclass
class Wildcard(Node):
    field_name: str = ""
    value: str = ""          # * = any seq, ? = one char
    max_expansions: int = 50


@dataclass
class Regexp(Node):
    field_name: str = ""
    value: str = ""          # anchored full-match, Lucene-style
    max_expansions: int = 50


@dataclass
class Fuzzy(Node):
    field_name: str = ""
    value: str = ""
    fuzziness: int = 2       # max Levenshtein distance
    prefix_length: int = 0   # unedited leading chars (reference default 0)
    max_expansions: int = 50


@dataclass
class MatchBoolPrefix(Node):
    field_name: str = ""
    query: str = ""


@dataclass
class MatchPhrasePrefix(Node):
    field_name: str = ""
    query: str = ""
    max_expansions: int = 50


@dataclass
class FunctionScore(Node):
    """function_score (reference: index/query/functionscore/
    FunctionScoreQueryBuilder.java:74): a list of score functions over
    the matched set, combined by ``score_mode`` then applied to the
    query score by ``boost_mode``. Each function is a dict:
    {"kind": "field_value_factor" | "script_score" | "random_score" |
     "gauss" | "exp" | "linear" | "weight",
     "params": {...}, "weight": float, "filter": AnyNode | None}.
    All functions evaluate as Catalyst column arithmetic."""
    query: Optional["AnyNode"] = None
    functions: List[dict] = field(default_factory=list)
    score_mode: str = "multiply"  # multiply | sum | avg | max | min | first
    boost_mode: str = "multiply"  # multiply | sum | replace | avg | max | min
    min_score: Optional[float] = None  # drop hits scoring below (script_score)


@dataclass
class DistanceFeature(Node):
    """distance_feature (reference: index/query/
    DistanceFeatureQueryBuilder.java): rank boost by closeness of a
    numeric/date field to ``origin`` — score = boost * pivot /
    (pivot + |value - origin|). Docs with a null field do not match."""
    field_name: str = ""
    origin: float = 0.0
    pivot: float = 1.0


@dataclass
class RankFeature(Node):
    """rank_feature (reference: modules/mapper-extras
    RankFeatureQueryBuilder / Lucene FeatureField): score a numeric
    feature column with a monotone saturation function —
    saturation: S/(S+pivot); log: ln(scaling_factor + S);
    sigmoid: S^exp / (S^exp + pivot^exp)."""
    field_name: str = ""
    function: str = "saturation"   # saturation | log | sigmoid
    pivot: float = 1.0
    scaling_factor: float = 1.0
    exponent: float = 1.0


@dataclass
class Pinned(Node):
    """pinned query (reference: the search-pinned module /
    PinnedQueryBuilder): listed ids rank first (in list order), organic
    hits follow by their own scores."""
    ids: List[int] = field(default_factory=list)
    organic: Optional["AnyNode"] = None


@dataclass
class Boosting(Node):
    positive: Optional["AnyNode"] = None
    negative: Optional["AnyNode"] = None
    negative_boost: float = 0.5


@dataclass
class Nested(Node):
    """nested query (reference: NestedQueryBuilder.java:83): match
    parents by a predicate over sub-documents in an array<struct>
    column; score_mode avg/sum/max/min/none over per-child scores.
    Inner query: term-level predicates on `path.field` names (the
    Spark-first nested surface — children live in the parent row)."""
    path: str = ""
    query: Optional["AnyNode"] = None
    score_mode: str = "avg"


@dataclass
class TermsSetQ(Node):
    """terms_set (reference: TermsSetQueryBuilder.java:69 /
    Lucene CoveringQuery): docs containing at least ``required`` of the
    given terms; scored like a should-bool of term scores."""
    field_name: str = ""
    terms: List[str] = field(default_factory=list)
    required: int = 1


@dataclass
class ScriptQ(Node):
    """script query (reference: ScriptQueryBuilder.java:68). The
    Painless predicate is replaced by a Spark SQL boolean expression
    over corpus columns — the Spark-first scripting surface."""
    source: str = ""


@dataclass
class CommonTerms(Node):
    """common terms query (reference: CommonTermsQueryBuilder /
    MatchQuery.java:344-369, deprecated upstream): terms split by
    document-frequency cutoff; low-freq terms drive matching, high-freq
    terms only contribute score."""
    field_name: str = ""
    query: str = ""
    cutoff_frequency: float = 0.01   # <1 = fraction of docCount
    low_freq_operator: str = "or"
    high_freq_operator: str = "or"
    minimum_should_match: int = 0


@dataclass
class MultiMatch(Node):
    """multi_match (reference: MultiMatchQueryBuilder.java:67).
    best_fields = dis_max over per-field match (+ tie_breaker);
    most_fields = sum of per-field match scores; phrase = dis_max of
    per-field match_phrase; bool_prefix = dis_max of per-field
    match_bool_prefix; cross_fields = term-centric blended-df scoring
    (reference: MultiMatchQuery.java blended term queries).
    ``field_boosts`` carries per-field caret boosts ("title^3")."""
    fields: List[str] = field(default_factory=list)
    field_boosts: List[float] = field(default_factory=list)
    query: str = ""
    type: str = "best_fields"   # best_fields | most_fields | phrase | cross_fields | bool_prefix
    tie_breaker: float = 0.0
    operator: str = "or"
    minimum_should_match: int = 0


@dataclass
class CombinedFields(Node):
    """combined_fields (reference: index/query/CombinedFieldsQueryBuilder.java:48
    / Lucene CombinedFieldQuery, BM25F): fields are merged into one
    synthetic field — tf_c = sum_f w_f*tf_f, dl_c = sum_f w_f*dl_f,
    df_c = |docs where any field contains t| — and BM25 runs once over
    the combined statistics. Documented divergence: dl_c uses the exact
    (unquantized) per-field lengths, not Lucene's re-quantized combined
    norm."""
    fields: List[str] = field(default_factory=list)
    field_boosts: List[float] = field(default_factory=list)
    query: str = ""
    operator: str = "or"
    minimum_should_match: int = 0


@dataclass
class SpanTerm(Node):
    """span_term (reference: SpanTermQueryBuilder)."""
    field_name: str = ""
    value: str = ""


@dataclass
class SpanNear(Node):
    """span_near (reference: SpanNearQueryBuilder.java:65)."""
    clauses: List["AnyNode"] = field(default_factory=list)
    slop: int = 0
    in_order: bool = True


@dataclass
class SpanOr(Node):
    clauses: List["AnyNode"] = field(default_factory=list)


@dataclass
class SpanFirst(Node):
    """span_first: match spans ending at position <= end."""
    match: Optional["AnyNode"] = None
    end: int = 0


@dataclass
class SpanNot(Node):
    include: Optional["AnyNode"] = None
    exclude: Optional["AnyNode"] = None


@dataclass
class SpanWithin(Node):
    """span_within (reference: index/query/SpanWithinQueryBuilder.java):
    spans of ``little`` fully enclosed by some ``big`` span."""
    little: Optional["AnyNode"] = None
    big: Optional["AnyNode"] = None


@dataclass
class SpanContaining(Node):
    """span_containing (reference: SpanContainingQueryBuilder.java):
    spans of ``big`` that enclose at least one ``little`` span."""
    little: Optional["AnyNode"] = None
    big: Optional["AnyNode"] = None


@dataclass
class SpanMulti(Node):
    """span_multi (reference: SpanMultiTermQueryBuilder.java): wraps a
    multi-term query (prefix/wildcard/regexp/fuzzy); dictionary
    expansion yields a span_or of term spans."""
    match: Optional["AnyNode"] = None


@dataclass
class Intervals(Node):
    """intervals query (reference: IntervalQueryBuilder.java:55).
    ``rule`` is the parsed source tree: ("match", terms, max_gaps,
    ordered) | ("all_of", [rules], max_gaps, ordered) |
    ("any_of", [rules])."""
    field_name: str = ""
    rule: Any = None


@dataclass
class MoreLikeThis(Node):
    field_name: str = ""
    like_doc_id: Optional[int] = None
    like_text: Optional[str] = None
    max_query_terms: int = 10
    include: bool = False    # exclude the source doc by default


AnyNode = Union[
    Match, MatchPhrase, Bool, TermQ, TermsQ, RangeQ, Exists, Ids,
    MatchAll, MatchNone, ConstantScore, DisMax, DistanceFeature,
    RankFeature, Pinned,
    Prefix, Wildcard, Regexp, Fuzzy, MatchBoolPrefix, MatchPhrasePrefix,
    MoreLikeThis, FunctionScore, Boosting,
    SpanTerm, SpanNear, SpanOr, SpanFirst, SpanNot, SpanWithin,
    SpanContaining, SpanMulti, Intervals, MultiMatch, CombinedFields,
    TermsSetQ, ScriptQ, CommonTerms, Nested,
]
