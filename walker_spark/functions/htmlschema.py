"""HTML schema validation (H4/S5/A8) — from-scratch reimplementation of
the reference ``htmlschema`` package semantics on our own DOM.

Capabilities (reference file:line for parity checking):

* schema trees loaded FROM HTML (``loader.go:14-52``): occurrence attrs
  ``val:min/max/optional/forbidden/count`` (default min=max=1,
  ``loader.go:211-214``), ``val:score``, element content length
  ``val:min-length/max-length``, attribute rules ``val:attr="name;
  rule:data;..."`` with regex (URL-unescaped, ``attributerules.go:51-54``)
  and length rules (min-length strict >, length ==, max-length strict <,
  ``loader.go:180-196`` — quirks kept), plain attributes as match
  predicates with ``*`` = any non-empty (``validate.go:287``),
  ``<ref>file</ref>`` includes (``loader.go:75-92``), and
  ``<val:selector selector="css">`` blocks (``validate.go:252-271``).
* recursive validation walk (``validate.go:354-395``): occurrence check
  per matching sibling set, Score += count×score when count OK
  (``validate.go:348-350``), content-length checks over first text
  child (byte lengths, like Go ``len(string)``), attribute-rule checks,
  path strings with ``[i]``/``[missing]`` suffixes.
* group → schema resolution (``groups.go:16-65``): ``root/{group}/
  {page}.html`` + ``root/default.html``.

Spark face: :func:`validate_udf` (Arrow-batched, broadcast schemas) and
:func:`validation_metrics` (A8 rollup, ``validationmetrics.go:10-43``).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from urllib.parse import unquote

from .dom import Node, parse_dom

__all__ = [
    "SchemaElement",
    "Schema",
    "load_schema",
    "load_schema_html",
    "GroupValidator",
    "Report",
    "Validation",
    "validate_udf",
    "validation_metrics",
]


# --------------------------------------------------------------- model

@dataclass
class AttributeRule:
    kind: str  # 'regex' | 'min-length' | 'length' | 'max-length'
    data: str
    _rx: re.Pattern | None = None

    def check(self, node: Node, attr_name: str) -> bool:
        val = node.attr(attr_name)
        if self.kind == "regex":
            if self._rx is None:
                self._rx = re.compile(self.data)
            return self._rx.search(val) is not None
        n = len(val.encode("utf-8"))
        want = int(self.data)
        if self.kind == "min-length":
            return n > want  # strict, loader.go:189
        if self.kind == "length":
            return n == want
        return n < want  # max-length strict, loader.go:193


@dataclass
class SchemaAttribute:
    name: str
    value: str = ""
    rules: dict[str, AttributeRule] = field(default_factory=dict)


@dataclass
class SchemaElement:
    name: str
    source: str = ""
    min_occurrence: int = -1
    max_occurrence: int = -1
    score: int = 0
    min_length: int = -1
    max_length: int = -1
    selector: str = ""
    attributes: list[SchemaAttribute] = field(default_factory=list)
    children: list["SchemaElement"] = field(default_factory=list)


@dataclass
class Schema:
    name: str
    elements: list[SchemaElement] = field(default_factory=list)


@dataclass
class Validation:
    type: str  # occurence-mismatch | content-length | content | attribute
    path: str
    comment: str
    penalty: int


@dataclass
class Report:
    score: int = 0
    validations: list[Validation] = field(default_factory=list)

    def total_penalty(self) -> int:
        return sum(v.penalty for v in self.validations)


# --------------------------------------------------------------- loader

def _element_from_node(n: Node, source: str, file_loader) -> SchemaElement | None:
    if n.type != "element":
        return None
    el = SchemaElement(name=n.data, source=source)
    _load_attributes(el, n)
    if el.name == "val:selector":
        el.selector = n.attr("selector")
        if el.selector == "":
            raise ValueError('<val:selector selector="must not be empty">')
    elif el.name == "ref":
        ref = "".join(c.data for c in n.children if c.type == "text").strip()
        if not ref:
            raise ValueError("can not load empty ref")
        if file_loader is None:
            raise ValueError("ref include needs a file loader")
        sub = file_loader(ref, source)
        if len(sub.elements) != 1:
            raise ValueError("a sub schema must have exactly one top level element")
        return sub.elements[0]
    for c in n.children:
        child = _element_from_node(c, source, file_loader)
        if child is not None:
            el.children.append(child)
    return el


def _load_attributes(el: SchemaElement, n: Node) -> None:
    occurrence_set = False
    for key, val in n.attrs:
        if key == "val:score":
            el.score = int(val)
        elif key == "val:min":
            el.min_occurrence = int(val)
            occurrence_set = True
        elif key == "val:max":
            el.max_occurrence = int(val)
            occurrence_set = True
        elif key == "val:optional":
            el.min_occurrence = 0
            occurrence_set = True
        elif key == "val:forbidden":
            el.max_occurrence = 0
            occurrence_set = True
        elif key == "val:min-length":
            el.min_length = int(val)
        elif key == "val:max-length":
            el.max_length = int(val)
        elif key == "val:count":
            el.min_occurrence = el.max_occurrence = int(val)
            occurrence_set = True
        elif key == "val:attr":
            parts = val.split(";")
            attr = SchemaAttribute(name="", value=val)
            for i, part in enumerate(parts):
                part = part.strip(" \t\n")
                if i == 0:
                    attr.name = part
                    continue
                rule_parts = part.split(":", 1)
                if len(rule_parts) == 2:
                    rname = rule_parts[0].strip("\t ")
                    rdata = rule_parts[1].strip("\t ")
                    if rname == "regex":
                        rx = unquote(rdata)
                        re.compile(rx)  # fail fast like the reference
                        attr.rules[rname] = AttributeRule("regex", rx)
                    elif rname in ("min-length", "length", "max-length"):
                        int(rdata)
                        attr.rules[rname] = AttributeRule(rname, rdata)
            if attr.name and attr.rules:
                el.attributes.append(attr)
        else:
            el.attributes.append(SchemaAttribute(name=key, value=val))
    if el.max_occurrence > -1 and el.min_occurrence > el.max_occurrence:
        raise ValueError(
            f"min occurrence > max occurrence for {el.name} in {el.source}"
        )
    if not occurrence_set:
        el.min_occurrence = 1
        el.max_occurrence = 1


def load_schema_html(html: str, name: str = "<inline>", includes: dict[str, str] | None = None) -> Schema:
    """Load a schema from HTML text. ``includes`` resolves ``<ref>``
    paths (relative paths joined against the includer's name)."""

    def loader(ref: str, source: str) -> Schema:
        key = ref if includes and ref in includes else os.path.normpath(
            os.path.join(os.path.dirname(source), ref)
        )
        if not includes or key not in includes:
            raise ValueError(f"could not load nested schema from ref: {ref}")
        return load_schema_html(includes[key], key, includes)

    root = parse_dom(html)
    schema = Schema(name=name)
    for n in root.children:
        el = _element_from_node(n, name, loader)
        if el is not None:
            schema.elements.append(el)
    return schema


def load_schema(path: str) -> Schema:
    """Filesystem loader with real ``<ref>`` file resolution."""

    def loader(ref: str, source: str) -> Schema:
        f = ref if os.path.isabs(ref) else os.path.join(os.path.dirname(source), ref)
        return load_schema(f)

    with open(path) as fh:
        html = fh.read()
    root = parse_dom(html)
    schema = Schema(name=path)
    for n in root.children:
        el = _element_from_node(n, path, loader)
        if el is not None:
            schema.elements.append(el)
    return schema


# --------------------------------------------------------------- selector

_SEL_PART = re.compile(
    r"^(?P<tag>[\w:-]+|\*)?(?P<mods>(?:[.#][\w-]+|\[[^\]]+\])*)$"
)


def _match_simple(node: Node, part: str) -> bool:
    m = _SEL_PART.match(part)
    if not m:
        return False
    tag = m.group("tag")
    if tag and tag != "*" and node.data != tag:
        return False
    for mod in re.findall(r"[.#][\w-]+|\[[^\]]+\]", m.group("mods") or ""):
        if mod.startswith("."):
            if mod[1:] not in node.attr("class").split():
                return False
        elif mod.startswith("#"):
            if node.attr("id") != mod[1:]:
                return False
        else:
            inner = mod[1:-1]
            if "=" in inner:
                k, v = inner.split("=", 1)
                if node.attr(k.strip()) != v.strip().strip("\"'"):
                    return False
            elif not node.has_attr(inner.strip()):
                return False
    return True


def css_select(root: Node, selector: str) -> list[Node]:
    """Subset CSS: comma groups of descendant chains of simple selectors
    (tag, .class, #id, [attr], [attr=value]) — covers the reference's
    schema usage (goquery selectors in ``validate.go:253``)."""
    out: list[Node] = []
    seen: set[int] = set()
    for group in selector.split(","):
        chain = group.split()
        if not chain:
            continue
        for node in root.walk():
            if node.type != "element" or not _match_simple(node, chain[-1]):
                continue
            # check ancestor chain
            ok = True
            if len(chain) > 1:
                ok = _has_ancestor_chain(root, node, chain[:-1])
            if ok and id(node) not in seen:
                seen.add(id(node))
                out.append(node)
    return out


def _has_ancestor_chain(root: Node, target: Node, chain: list[str]) -> bool:
    # build ancestor path by DFS (nodes have no parent pointers)
    path: list[Node] = []

    def dfs(n: Node) -> bool:
        if n is target:
            return True
        if n.type == "element":
            path.append(n)
            for c in n.children:
                if dfs(c):
                    return True
            path.pop()
        return False

    dfs(root)
    idx = 0
    for anc in path:
        if idx < len(chain) and _match_simple(anc, chain[idx]):
            idx += 1
    return idx >= len(chain)


# --------------------------------------------------------------- validator

def _get_matching_nodes(el: SchemaElement, parent: Node | None):
    expected_attrs: dict[str, str] = {}
    if el.selector and parent is not None:
        wrapped = []
        for n in css_select(parent, el.selector):
            w = Node("element", "selectionRoot", [], [n])
            wrapped.append(w)
        return wrapped, expected_attrs
    for attr in el.attributes:
        if attr.rules or attr.name.startswith("val:"):
            continue
        expected_attrs[attr.name] = attr.value
    matching: list[Node] = []
    if parent is not None:
        for n in parent.element_children():
            if n.data != el.name:
                continue
            ok = True
            for k, v in expected_attrs.items():
                actual = n.attr(k)
                if actual != v and not (v == "*" and actual != ""):
                    ok = False
                    break
            if ok:
                matching.append(n)
    return matching, expected_attrs


def _validate_occurrence(el: SchemaElement, parent: Node | None, path: list[str], r: Report):
    matching, _ = _get_matching_nodes(el, parent)
    count = len(matching)
    count_ok = True
    if el.selector:
        pass  # no occurrence validation on selectors (validate.go:327)
    elif el.max_occurrence > -1 and count > el.max_occurrence:
        count_ok = False
        r.validations.append(
            Validation(
                "occurence-mismatch",
                "/".join(path),
                f"too many elements of <{el.name}> got {count} expected not more than {el.max_occurrence}",
                el.score,
            )
        )
    elif count < el.min_occurrence:
        count_ok = False
        r.validations.append(
            Validation(
                "occurence-mismatch",
                "/".join(path),
                f"too few elements of <{el.name}> got {count} expected at least {el.min_occurrence}",
                el.score,
            )
        )
    if count_ok:
        r.score += count * el.score
    return matching


def _validate_content_length(el: SchemaElement, path: list[str], r: Report, matching: list[Node]):
    if el.min_length <= -1 and el.max_length <= -1:
        return
    for node in matching:
        fc = node.first_child()
        if fc is None or fc.type != "text":
            r.validations.append(
                Validation(
                    "content", "/".join(path), "wrong content type must be a text node", el.score
                )
            )
            continue
        content = fc.data.strip(" \t\n")
        n = len(content.encode("utf-8"))  # Go len() is bytes
        if n < el.min_length:
            r.validations.append(
                Validation(
                    "content",
                    "/".join(path),
                    f"content too short got {n} expected {el.min_length}",
                    el.score,
                )
            )
        if el.max_length > -1 and n > el.max_length:
            r.validations.append(
                Validation(
                    "content",
                    "/".join(path),
                    f"content too long got {n} expected {el.max_length}",
                    el.score,
                )
            )


def _validate_attributes(el: SchemaElement, path: list[str], r: Report, matching: list[Node]):
    if not any(a.rules for a in el.attributes):
        return
    for node in matching:
        for attr in el.attributes:
            for rule_name, rule in attr.rules.items():
                if not rule.check(node, attr.name):
                    r.validations.append(
                        Validation(
                            "attribute",
                            "/".join(path + ["@" + attr.name]),
                            f"invalid attribute value with rule {rule_name}: "
                            + node.attr(attr.name),
                            el.score,
                        )
                    )


def _validate_node(
    el: SchemaElement,
    parent_index: int,
    parent_count: int,
    parent: Node | None,
    path: list[str],
    r: Report,
):
    next_path = el.name + (f"({el.selector})" if el.selector else "")
    if parent_index == -1:
        next_path += "[missing]"
    elif parent_count > 1:
        next_path += f"[{parent_index}]"
    path = path + [next_path]

    matching = _validate_occurrence(el, parent, path, r)
    _validate_content_length(el, path, r, matching)
    _validate_attributes(el, path, r, matching)

    for child in el.children:
        if matching:
            for i, m in enumerate(matching):
                _validate_node(child, i, len(matching), m, path, r)
        elif not el.selector:
            _validate_node(child, -1, -1, None, path, r)


def validate(schema: Schema, html: str) -> Report:
    doc = parse_dom(html)
    r = Report()
    for el in schema.elements:
        _validate_node(el, 0, 1, doc, [], r)
    return r


# --------------------------------------------------------------- groups

class GroupValidator:
    """group → schema resolution (``groups.go:16-65``): the schema for
    group "a/b" lives at root/a/b.html; group "default" uses
    root/default.html."""

    def __init__(self, schemas: dict[str, Schema], default: Schema | None = None):
        self.schemas = schemas  # "group_dir/page" -> Schema
        self.default = default

    @classmethod
    def from_dir(cls, root: str) -> "GroupValidator":
        schemas: dict[str, Schema] = {}
        default = None
        for entry in sorted(os.listdir(root)):
            p = os.path.join(root, entry)
            if os.path.isdir(p) and not entry.startswith("."):
                for f in sorted(os.listdir(p)):
                    if f.startswith(".") or os.path.isdir(os.path.join(p, f)):
                        continue
                    schemas[f"{entry}/{f.removesuffix('.html')}"] = load_schema(
                        os.path.join(p, f)
                    )
            elif entry == "default.html":
                default = load_schema(p)
        return cls(schemas, default)

    @classmethod
    def from_dict(
        cls, group_html: dict[str, str], includes: dict[str, str] | None = None
    ) -> "GroupValidator":
        schemas = {}
        default = None
        for group, html in group_html.items():
            s = load_schema_html(html, name=f"{group}.html", includes=includes)
            if group == "default":
                default = s
            else:
                schemas[group] = s
        return cls(schemas, default)

    def schema_for(self, group: str) -> Schema | None:
        if group == "default" and self.default is not None:
            return self.default
        return self.schemas.get(group)

    def validate(self, group: str, html: str) -> Report | None:
        s = self.schema_for(group)
        if s is None:
            return None  # "could not find schema for <group>"
        return validate(s, html)


# --------------------------------------------------------------- Spark face

VALIDATION_REPORT_TYPE = (
    "struct<score:int,validations:array<struct<type:string,path:string,"
    "comment:string,penalty:int>>>"
)


def validate_udf(spark, gv: GroupValidator):
    """Arrow-batched (group, html) → validation report struct; null when
    no schema matches the group (walker stores a nil report then)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(gv)

    @pandas_udf(VALIDATION_REPORT_TYPE)
    def _validate(group, html):  # (pd.Series, pd.Series) -> pd.DataFrame
        v = bc.value
        scores, validations = [], []
        for g, h in zip(group, html):
            if isinstance(h, (bytes, bytearray)):
                h = bytes(h).decode("utf-8", errors="replace")
            rep = v.validate(g or "default", h or "")
            if rep is None:
                scores.append(None)
                validations.append(None)
            else:
                scores.append(rep.score)
                validations.append(
                    [
                        {"type": x.type, "path": x.path, "comment": x.comment, "penalty": x.penalty}
                        for x in rep.validations
                    ]
                )
        return pd.DataFrame({"score": scores, "validations": validations})

    return _validate


def validation_metrics(results, paths: list[str]):
    """A8 rollup (``validationmetrics.go:10-43``): per (group, path) sum
    of scores; per (group, path, validation type) sum of penalties.
    ``path`` = longest configured prefix matching the URL path
    (length-desc CASE chain, ``walker.go:31-42``), else '/'.

    ``results`` needs: url, group, validation_report (struct as above).
    Returns (scores_df, penalties_df).
    """
    from pyspark.sql import functions as F

    from ..config import sort_paths_by_length
    from ..operators.linkfilter import path_of

    upath = path_of(F.col("url"))
    expr = None
    for p in sort_paths_by_length(paths):
        cond = upath.startswith(p)
        expr = F.when(cond, p) if expr is None else expr.when(cond, p)
    path_col = expr.otherwise("/") if expr is not None else F.lit("/")

    # NB: the pandas-UDF output path renders a missing report as a
    # struct of nulls, not a null struct — test on .score.
    with_rep = results.filter(F.col("validation_report.score").isNotNull()).select(
        F.col("group"),
        path_col.alias("path"),
        F.col("validation_report.score").alias("score"),
        F.col("validation_report.validations").alias("validations"),
    )
    scores = (
        with_rep.groupBy("group", "path")
        .agg(F.sum("score").alias("score"), F.count(F.lit(1)).alias("pages"))
        .orderBy("group", "path")
    )
    penalties = (
        with_rep.select(
            "group", "path", F.explode_outer("validations").alias("v")
        )
        .filter(F.col("v").isNotNull())
        .groupBy("group", "path", F.col("v.type").alias("validation_type"))
        .agg(F.sum("v.penalty").alias("penalty"))
        .orderBy("group", "path", "validation_type")
    )
    return scores, penalties
