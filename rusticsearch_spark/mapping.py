"""ES-style mapping layer.

Ports the semantics of /root/reference/src/mapping/mod.rs:

* properties: ``{field: {type, analyzer/index_analyzer/search_analyzer,
  boost, store, index, include_in_all}}`` (FieldMapping,
  mod.rs:41-118);
* mapping-level types String/Integer/Boolean/Date (mod.rs:34-39)
  translated to index-level Text/PlainString/I64/Boolean/DateTime
  (api/mapping_api.rs:62-67): ``type: string`` with ``index:
  not_analyzed`` → PlainString (raw term), else Text with the
  configured analyzer;
* the ``_all`` field: every ``include_in_all`` string field's value
  concatenated with a single space and indexed with the default
  analyzer (src/document.rs:46-52,100-118) — built here as a
  ``concat_ws(" ", ...)`` column so it rides the normal build path;
* analyzer resolution precedence: field-level > index default
  (mapping/build.rs tests).

The output is an :class:`index.layout.IndexConfig` plus a DataFrame
transformer that synthesizes derived columns (``_all``, stringified
numerics/booleans/dates) before ``build_index``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index.layout import IndexConfig

MAPPING_TYPES = {"string", "integer", "boolean", "date"}


@dataclass
class FieldMapping:
    name: str
    type: str = "string"                  # mapping-level type
    analyzer: Optional[str] = "standard"  # index side; None ⇒ not_analyzed
    #: query-side analyzer when it differs from the index side
    #: (mod.rs:161-166 FieldSearchOptions, consumed by
    #: query_parser/match_query.rs:36-44); None ⇒ same as `analyzer`
    search_analyzer: Optional[str] = None
    #: parsed + round-tripped but NOT applied at search time — exact
    #: parity with the reference, which parses mapping-level boost
    #: into FieldMapping (mod.rs:92,135) and never consumes it in any
    #: query path (only query-level boost, match_query.rs:72-73, is
    #: live)
    boost: float = 1.0
    store: bool = False
    include_in_all: bool = True
    is_indexed: bool = True               # index: "no" ⇒ False (mod.rs:87)
    #: set on subfields of an ES ``nested``-TYPE mapping: the array
    #: path whose elements index as child documents (prepare_docs
    #: explodes them; the engine's `nested` query joins them back)
    nested_path: Optional[str] = None
    #: every nested-TYPE ancestor path, outermost first, ending at
    #: ``nested_path`` — e.g. ("a", "a.b") for field "a.b.c".  Keeps
    #: INTERMEDIATE nested levels visible to mapping_to_config even
    #: when a level declares no direct (non-nested) subfields.
    nested_chain: tuple = ()

    @property
    def is_analyzed(self) -> bool:
        return self.type == "string" and self.analyzer is not None


class MappingParseError(ValueError):
    pass


def parse_mapping(mapping_json: dict,
                  default_analyzer: str = "standard",
                  _prefix: str = "") -> List[FieldMapping]:
    """Parse the ``properties`` dict of an ES mapping body.

    Nested OBJECT mappings (``{"author": {"properties": {...}}}`` or
    explicit ``type: "object"``) recurse into dotted field names
    (``author.name``) — ES object-field semantics, and the closure of
    the reference's own TODO (/root/reference/src/document.rs:87-89
    "Nested objects" left unimplemented).  The ES ``nested`` TYPE
    (independent matching per array element) is a different feature
    and is rejected with a clear error."""
    props = mapping_json.get("properties", mapping_json)
    if not isinstance(props, dict) or not props:
        raise MappingParseError("mapping needs non-empty 'properties'")
    out: List[FieldMapping] = []
    for short, spec in props.items():
        spec = spec or {}
        if "`" in short:
            raise MappingParseError(
                f"illegal character in field name: {short!r}")
        if "." in short:
            # dotted PROPERTY names would be indistinguishable from
            # nested paths after flattening (ES likewise treats dots
            # as object-path separators since 2.x)
            raise MappingParseError(
                f"field name {short!r} contains '.'; declare nested "
                "objects via 'properties' instead")
        name = _prefix + short
        if spec.get("type") == "nested":
            # ES nested TYPE: array elements become child documents
            # with independent matching (the feature the reference's
            # document.rs:87-89 TODO stops short of).  Nested may
            # appear under objects and under other nested types; the
            # chain of nested ancestors rides on every subfield.
            if "properties" not in spec or not spec["properties"]:
                raise MappingParseError(
                    f"field {name!r}: nested type needs 'properties'")
            subs = parse_mapping(spec, default_analyzer,
                                 _prefix=name + ".")
            for s in subs:
                if s.nested_path is None:
                    s.nested_path = name
                s.nested_chain = (name,) + tuple(s.nested_chain)
                # nested text stays out of the parent's _all (child
                # docs are separate rows; joining them into the
                # parent _all would cross the element boundary the
                # type exists to preserve)
                s.include_in_all = False
            out.extend(subs)
            continue
        if "properties" in spec:
            if spec.get("type") not in (None, "object"):
                raise MappingParseError(
                    f"field {name!r}: 'properties' requires object type")
            out.extend(parse_mapping(spec, default_analyzer,
                                     _prefix=name + "."))
            continue
        ftype = spec.get("type", "string")
        if ftype not in MAPPING_TYPES:
            raise MappingParseError(f"unknown field type: {ftype!r}")
        analyzer: Optional[str]
        search_analyzer: Optional[str] = None
        is_indexed = spec.get("index") != "no"
        if ftype != "string" or not is_indexed:
            analyzer = None               # non-string: single exact term
        elif spec.get("index") == "not_analyzed":
            analyzer = None
        else:
            # per side: specific key > base "analyzer" > index default
            # (mapping/build.rs:40-82)
            base = spec.get("analyzer")
            analyzer = (spec.get("index_analyzer") or base
                        or default_analyzer)
            search_analyzer = (spec.get("search_analyzer") or base
                               or default_analyzer)
            if search_analyzer == analyzer:
                search_analyzer = None    # no override needed
        out.append(FieldMapping(
            name=name, type=ftype, analyzer=analyzer,
            search_analyzer=search_analyzer,
            boost=float(spec.get("boost", 1.0)),
            store=bool(spec.get("store", False)),
            # only string fields ever join _all (document.rs:100-118)
            include_in_all=(ftype == "string"
                            and bool(spec.get("include_in_all", True))),
            is_indexed=is_indexed,
        ))
    return out


def mapping_to_config(fields: List[FieldMapping], key_col: str,
                      with_all: bool = True,
                      analysis_settings: Optional[dict] = None,
                      **kwargs) -> IndexConfig:
    cfg_fields: Dict[str, Optional[str]] = {}
    field_types: Dict[str, str] = {}
    search_analyzers: Dict[str, str] = {}
    for f in fields:
        if not f.is_indexed:
            # index:"no" → is_indexed=false in the reference
            # (mod.rs:87): the field must not be searchable; it stays
            # available as a stored column only
            continue
        cfg_fields[f.name] = f.analyzer if f.is_analyzed else None
        if f.is_analyzed and f.search_analyzer:
            search_analyzers[f.name] = f.search_analyzer
        if f.type != "string":
            field_types[f.name] = f.type
    if with_all and any(f.include_in_all for f in fields):
        cfg_fields["_all"] = "standard"
    stored = [f.name for f in fields if f.store]
    # every nested level, INCLUDING intermediates that declare no
    # direct subfields (the chain carries them; nested_path alone
    # would lose "a" in {"a": nested {"b": nested {...}}})
    nested_paths = sorted(
        {p for f in fields
         for p in (f.nested_chain
                   or ((f.nested_path,) if f.nested_path else ()))})
    if nested_paths:
        # child→parent and child→root mapping columns, stored (never
        # indexed).  _nested_root buckets all of a document's levels
        # into one build job and drives root-level delete cascades.
        stored = stored + ["_nested_parent", "_nested_root"]
    return IndexConfig(key_col=key_col, fields=cfg_fields,
                       field_types=field_types,
                       search_analyzers=search_analyzers, stored=stored,
                       nested_paths=nested_paths,
                       analysis_settings=analysis_settings, **kwargs)


def canonical_date_col(col) -> "F.Column":
    """Render a timestamp column as the engine's canonical UTC term
    string (terms.canonical_term_string for type 'date').  Spark's
    date_format renders in the SESSION timezone, so the instant is
    first shifted such that session-tz rendering equals UTC
    wall-clock."""
    return F.date_format(
        F.to_utc_timestamp(col, F.expr("current_timezone()")),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


def prepare_docs(docs: DataFrame, fields: List[FieldMapping],
                 with_all: bool = True,
                 key_col: Optional[str] = None) -> DataFrame:
    """Synthesize mapping-derived columns on the source DataFrame:

    * numerics/booleans/dates stringified the way the query layer
      stringifies term values (utils.rs:63-77 ↔ dsl._as_string):
      booleans → 'true'/'false', integers → decimal string, dates →
      ISO-8601 micros (terms.py documents the byte-level equivalence);
    * ``_all`` = space-joined include_in_all string values in mapping
      order (document.rs:100-118);
    * nested object fields (``author.name``) flattened from their
      struct columns into TOP-LEVEL columns literally named with the
      dotted path; the root struct columns are dropped afterwards so
      every later by-name reference resolves unambiguously (via
      ``layout.qname`` backtick quoting);
    * ES ``nested``-TYPE paths (array<struct> columns): each element
      becomes a CHILD ROW — key ``<parent>#<path>#<pos>``, the
      element's subfields as dotted columns, ``_nested_parent`` = the
      parent key — unioned under the parent rows (requires
      ``key_col``; keys are cast to string so child keys compose).
      One distributed posexplode, no per-row Python.
    """
    from .index.layout import qname
    nested_paths = sorted(
        {p for f in fields
         for p in (f.nested_chain
                   or ((f.nested_path,) if f.nested_path else ()))})
    if nested_paths and key_col is None:
        raise MappingParseError(
            "nested-type mappings require key_col at prepare_docs")
    out = docs
    roots = set()
    for f in fields:
        if "." in f.name and not f.nested_path:
            # struct-path navigation while the root struct is still
            # present; withColumn names the result LITERALLY
            out = out.withColumn(f.name, F.col(f.name))
            roots.add(f.name.split(".", 1)[0])
    for r in sorted(roots):
        out = out.drop(r)
    if nested_paths:
        from .nested import by_depth, nested_parent_path
        out = out.withColumn(key_col, F.col(qname(key_col))
                             .cast("string"))
        # shallow→deep: a deeper path explodes from its PARENT's
        # child frame (its array column was carried through as the
        # literally-dotted element subcolumn)
        frames: Dict[str, DataFrame] = {}
        for path in by_depth(nested_paths):
            par = nested_parent_path(path, nested_paths)
            deeper = [q for q in nested_paths
                      if nested_parent_path(q, nested_paths) == path]
            subs = [f for f in fields if f.nested_path == path]
            if par is None:
                src, arr = docs, F.col(path)
                pk = F.col(qname(key_col)).cast("string")
                root = pk
            else:
                src, arr = frames[par], F.col(qname(path))
                pk = F.col(qname(key_col))
                root = F.col("_nested_root")
            kids = src.select(pk.alias("_pk"), root.alias("_root"),
                              F.posexplode(arr).alias("_pos", "_el"))
            frames[path] = kids.select(
                F.concat(F.col("_pk"), F.lit(f"#{path}#"),
                         F.col("_pos").cast("string")).alias(key_col),
                F.col("_pk").alias("_nested_parent"),
                F.col("_root").alias("_nested_root"),
                *[F.col(f"_el.{s.name[len(path) + 1:]}")
                  .alias(s.name) for s in subs],
                # carry each child path's array for ITS explode
                *[F.col(f"_el.{q[len(path) + 1:]}").alias(q)
                  for q in deeper])
        # parents: drop the root COMPONENT of each top-level nested
        # path ("a" for "a", "o" for object-housed "o.a" — its plain
        # subfields were already flattened to literal dotted columns)
        root_drops = {p.split(".", 1)[0] for p in nested_paths
                      if nested_parent_path(p, nested_paths) is None}
        out = (out.drop(*sorted(root_drops))
               .withColumn("_nested_parent", F.lit(None).cast("string"))
               .withColumn("_nested_root", F.lit(None).cast("string")))
        for path in by_depth(nested_paths):
            deeper = [q for q in nested_paths
                      if nested_parent_path(q, nested_paths) == path]
            out = out.unionByName(frames[path].drop(*deeper),
                                  allowMissingColumns=True)
    for f in fields:
        c = F.col(qname(f.name))
        if f.type == "boolean":
            out = out.withColumn(
                f.name, F.when(c, "true")
                .otherwise(F.when(~c, "false")))
        elif f.type == "integer":
            out = out.withColumn(f.name, c.cast("long").cast("string"))
        elif f.type == "date":
            out = out.withColumn(f.name, canonical_date_col(c))
    if with_all and any(f.include_in_all for f in fields):
        parts = [F.coalesce(F.col(qname(f.name)), F.lit(""))
                 for f in fields if f.include_in_all]
        all_col = F.concat_ws(" ", *parts)
        if nested_paths:
            # child rows carry no _all (they'd otherwise enter the
            # _all field's doc/length statistics as empty docs)
            all_col = F.when(F.col("_nested_parent").isNull(), all_col)
        out = out.withColumn("_all", all_col)
    return out
