"""Search pipelines: request / response processors around a search.

Reference: ``modules/search-pipeline-common/.../SearchPipelineCommonModulePlugin.java``
— named pipelines of request processors (run before the query phase)
and response processors (run on the hit list). Spark-first shape: a
pipeline is a pure function over (request body) and over (hits
DataFrame); processors compose left-to-right.

Request processors: filter_query (AND an extra filter into the query),
script (rewrite request via a callable), oversample (multiply size).
Response processors: rename_field, truncate_hits, sort, collapse,
field_filter (keep/drop columns).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

from pyspark.sql import DataFrame, functions as F


class SearchPipeline:
    def __init__(self, request_processors: List[dict] | None = None,
                 response_processors: List[dict] | None = None):
        self.request_processors = request_processors or []
        self.response_processors = response_processors or []

    # -- request phase --------------------------------------------------

    def process_request(self, body: dict) -> dict:
        body = dict(body)
        for p in self.request_processors:
            ((kind, spec),) = p.items()
            if kind == "filter_query":
                q = body.get("query", {"match_all": {}})
                body["query"] = {"bool": {"must": [q],
                                          "filter": [spec["query"]]}}
            elif kind == "oversample":
                factor = float(spec.get("sample_factor", 2.0))
                body["size"] = int(body.get("size", 10) * factor)
                body["_oversampled_from"] = int(spec.get("original_size",
                                                body["size"] / factor))
            elif kind == "script":
                fn: Callable[[dict], dict] = spec["fn"]
                body = fn(body)
            else:
                raise ValueError(f"unknown request processor: {kind}")
        return body

    # -- response phase -------------------------------------------------

    def process_response(self, hits: DataFrame) -> DataFrame:
        out = hits
        for p in self.response_processors:
            ((kind, spec),) = p.items()
            if kind == "rename_field":
                out = out.withColumnRenamed(spec["field"], spec["target_field"])
            elif kind == "truncate_hits":
                out = out.limit(int(spec["target_size"]))
            elif kind == "sort":
                fld = spec["field"]
                order = spec.get("order", "asc")
                out = out.orderBy(
                    F.desc(fld) if order == "desc" else F.asc(fld)
                )
            elif kind == "collapse":
                from pyspark.sql import Window

                fld = spec["field"]
                w = Window.partitionBy(fld).orderBy(
                    F.desc("score"), F.asc("docId")
                )
                out = (
                    out.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") == 1).drop("_rn")
                )
            elif kind == "split":
                # reference: SplitResponseProcessor — split a string hit
                # field into an array. Java split(sep, 0) drops TRAILING
                # empty strings only; strip trailing separator matches
                # first to reproduce that exactly
                sep = spec["separator"]
                tgt = spec.get("target_field", spec["field"])
                src = F.col(spec["field"])
                if bool(spec.get("preserve_trailing", False)):
                    out = out.withColumn(tgt, F.split(src, sep, -1))
                else:
                    stripped = F.regexp_replace(src, f"(?:{sep})+$", "")
                    arr = F.split(stripped, sep, -1)
                    out = out.withColumn(
                        tgt,
                        # Java "".split(sep, 0) == [""]; all-separator
                        # input strips to "" and yields []
                        F.when(src == "", F.array(F.lit("")))
                        .when(stripped == "",
                              F.array().cast("array<string>"))
                        .otherwise(arr))
            elif kind == "field_filter":
                keep = spec.get("include")
                if keep:
                    cols = [c for c in out.columns if c in set(keep) | {"docId", "score"}]
                    out = out.select(*cols)
                for c in spec.get("exclude", []):
                    if c in out.columns:
                        out = out.drop(c)
            else:
                raise ValueError(f"unknown response processor: {kind}")
        return out

    def run(self, engine, body: dict) -> Dict[str, Any]:
        """Execute a full pipelined search (reference: `_search?search_pipeline=`)."""
        body2 = self.process_request(body)
        out = engine.request(body2)
        out["hits"] = self.process_response(out["hits"])
        if "_oversampled_from" in body2:
            out["hits"] = out["hits"].limit(int(body2["_oversampled_from"]))
        return out


class PipelineRegistry:
    """Named search pipelines (reference: RestPutSearchPipelineAction /
    SearchPipelineService): put/get/delete by id, plus a DEFAULT
    pipeline applied when a search names none
    (index.search.default_pipeline)."""

    def __init__(self):
        self._pipelines: Dict[str, SearchPipeline] = {}
        self.default: str | None = None

    def put(self, pipeline_id: str, body: dict) -> None:
        self._pipelines[pipeline_id] = SearchPipeline(
            request_processors=body.get("request_processors"),
            response_processors=body.get("response_processors"),
        )

    def get(self, pipeline_id: str) -> SearchPipeline:
        if pipeline_id not in self._pipelines:
            raise ValueError(f"no such search pipeline: {pipeline_id!r}")
        return self._pipelines[pipeline_id]

    def delete(self, pipeline_id: str) -> None:
        self._pipelines.pop(pipeline_id, None)
        if self.default == pipeline_id:
            self.default = None

    def ids(self) -> List[str]:
        return sorted(self._pipelines)

    def run(self, engine, body: dict,
            pipeline: str | None = None) -> Dict[str, Any]:
        """`_search?search_pipeline=<id>`; falls back to the default
        pipeline, then to a bare request."""
        pid = pipeline or self.default
        if pid is None:
            return engine.request(body)
        return self.get(pid).run(engine, body)
