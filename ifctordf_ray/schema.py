"""The extraction Schema — the analog of the reference's EXPRESS schema
dictionaries (`ent`/`typ`, IfcSpfReader.java:249-277) plus its ifcOWL
ontology lookups (IfcSpfReader.java:367-377), collapsed into closed,
precomputed Python lookup tables: no runtime reasoning.

Everything here is THE single source of truth shared by three consumers:

1. the distributed Ray Data pipeline (ifctordf_ray.stages.*),
2. the single-process pure-Python reference oracle (ifctordf_ray.oracle),
3. the generated DuckDB oracle SQL (__ray_entry__.oracle_sql),

so that all three provably compute the same (subj, pred, obj) triple set.

IRI minting is content-derived (hash / key-derived), replacing the
reference's global sequential `idCounter` (IfcSpfParser.java:13-14,
RDFWriter.java:136-137) which is fundamentally serial: content-derived IRIs
make every task idempotent and retry-safe, and make the emitted triple set
independent of execution order and parallelism.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# Namespaces.  Compact CURIE strings are used throughout the engine's triple
# datasets; the N-Triples sink expands them to full IRIs (sinks.py).
# --------------------------------------------------------------------------
PREFIXES: dict[str, str] = {
    "inst": "https://w3id.org/conv/inst/",   # instances (analog of baseURI, RDFWriter.java:159)
    "ont": "https://w3id.org/conv/ont#",     # classes/properties (analog of ontURI/ifcOWL)
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

RDF_TYPE = "rdf:type"

# Classes (TBox analog)
CLS_CONVERSATION = "ont:Conversation"
CLS_TURN = "ont:Turn"

# Object / datatype properties
P_HAS_TURN = "ont:hasTurn"            # conv -> turn (SET-valued, T4/test4 analog)
P_NEXT_TURN = "ont:nextTurn"          # turn -> turn  (list:hasNext chain analog, T7-T10)
P_HAS_ROLE = "ont:hasRole"            # turn -> role individual (enum analog, L6)
P_USED_TOOL = "ont:usedTool"          # turn -> tool individual (enum analog, L6)
P_TURN_INDEX = "ont:turnIndex"        # turn -> xsd:integer literal
P_AT_TIME = "ont:atTime"              # turn -> xsd:dateTime literal
P_HAS_TEXT = "ont:hasText"            # turn -> canonical text wrapper (D3 literal-wrapper analog, RDFWriter.java:799-827)
P_HAS_STRING = "ont:hasString"        # wrapper -> xsd:string literal (express:hasString analog, test5)
P_MENTIONS_NUMBER = "ont:mentionsNumber"  # turn -> canonical number wrapper
P_HAS_INTEGER = "ont:hasInteger"      # wrapper -> xsd:integer literal (verbatim lexical form, P5/test11)
P_MENTIONS_TURN = "ont:mentionsTurn"  # turn -> turn (cross-turn reference, J1 pointer-swizzle analog)
P_MENTIONS_DECIMAL = "ont:mentionsDecimal"  # turn -> canonical decimal wrapper
P_HAS_DOUBLE = "ont:hasDouble"        # wrapper -> xsd:double literal (VERBATIM lexical incl. "12." — P5/test11 analog, RDFWriter.java:674-686)
P_TOOL_FLAG = "ont:usedToolFlag"      # turn -> xsd:boolean literal (P5 boolean dispatch analog, RDFWriter.java:687-695)
P_TEXT_PRESENCE = "ont:textPresence"  # turn -> ont:logical/{TRUE,FALSE,UNKNOWN} (logical-individual analog, RDFWriter.java:696-704)
P_MENTIONS_LIST = "ont:mentionsList"  # turn -> head node of a structured list mention
P_HAS_CONTENTS = "ont:hasContents"    # list node -> cell value (list:hasContents analog, T7-T10/T13)
P_HAS_NEXT = "ont:hasNext"            # list node -> successor node (list:hasNext analog)
P_MENTIONS_HEX = "ont:mentionsHex"    # turn -> canonical hex wrapper
P_HAS_HEXBINARY = "ont:hasHexBinary"  # wrapper -> xsd:hexBinary literal (the last P5 dispatch branch, RDFWriter.java:678-686)

# Closed vocabularies (the enum NamedIndividual analog — RDFWriter.java:659-672;
# an unmatched value emits NO triple for the slot and an error row instead,
# matching the reference's ERROR 9 / golden test7 behavior).
ROLES: tuple[str, ...] = ("user", "assistant", "system", "tool")
TOOLS: tuple[str, ...] = ("logger", "search", "code", "browser", "shell")

# TBox class hierarchy (rdfs:subClassOf edges) — the readOntology/OntModel
# analog (IfcSpfReader reads the ifcOWL TBox and Jena materializes the
# class tree; here the tiny closed TBox is a schema constant and its
# TRANSITIVE closure is precomputed at import, broadcast-free).
SUBCLASS_OF: tuple[tuple[str, str], ...] = (
    (CLS_CONVERSATION, "ont:Dialogue"),
    ("ont:Dialogue", "ont:Resource"),
    (CLS_TURN, "ont:Utterance"),
    ("ont:Utterance", "ont:Resource"),
)


# SHACL-style cardinality shapes on ont:Turn-targeted predicates (the
# validation analog of the reference's WHERE/cardinality checks on EXPRESS
# attributes — IfcSpfReader aborts on malformed records; here violations
# are DATA, emitted as a report).  (pred, min_count, max_count); max=None
# means unbounded.  mentionsNumber max=1 is a deliberately strict QA gate:
# multi-number turns (a fifth of real corpora) violate it, so the 'max'
# branch of the report fires on real data, alongside 'min' rows from
# role-less (out-of-vocab-role) turns.
SHAPES: tuple[tuple[str, int, int | None], ...] = (
    (P_HAS_ROLE, 1, 1),
    (P_USED_TOOL, 0, 1),
    (P_NEXT_TURN, 0, 1),
    (P_MENTIONS_NUMBER, 0, 1),
    (P_MENTIONS_TURN, 0, 1),
)


def subclass_closure() -> dict[str, tuple[str, ...]]:
    """class -> ALL (transitive) superclasses, sorted.  Vocab-sized."""
    direct: dict[str, set[str]] = {}
    for c, s in SUBCLASS_OF:
        direct.setdefault(c, set()).add(s)
    out: dict[str, tuple[str, ...]] = {}
    for c in direct:
        seen: set[str] = set()
        stack = list(direct[c])
        while stack:
            s = stack.pop()
            if s not in seen:
                seen.add(s)
                stack.extend(direct.get(s, ()))
        out[c] = tuple(sorted(seen))
    return out

# Mention-detection regexes (the tokenizer analog, IfcSpfParser.java:60-145).
# RE2-compatible so Python `re` and DuckDB `regexp_extract_all` agree exactly.
NUM_RE = r"\d+"          # numeric mention; lexical form kept VERBATIM (P5 contract)
REF_RE = r"#(\d+)"       # reference to another turn of the same conversation
DEC_RE = r"\d+\.\d*"     # decimal mention; VERBATIM lexical ("12." stays "12.")
# hex mention '0x' + maximal hex-digit run; group 1 (case VERBATIM) is
# the xsd:hexBinary lexical.  ODD-length runs are skipped by the shared
# even-length filter (odd hex is outside xsd:hexBinary's lexical space —
# the reference's warn-and-skip dispatch, RDFWriter.java:678-686 analog).
HEX_RE = r"0x([0-9a-fA-F]+)"
# two-level structured list mention, e.g. "((1,2),(3,4))" (tool-call
# argument lists) — the _List_List analog (RDFWriter.java:427-436,
# reference tests 13/16/19).  RE2-safe fixed-depth pattern (no recursion)
# shared verbatim with DuckDB regexp_extract_all.
OUTER_LIST_RE = r"\(\(\d+(?:,\d+)*\)(?:,\(\d+(?:,\d+)*\))*\)"
INNER_LIST_RE = r"\((\d+(?:,\d+)*)\)"   # group 1 = comma-joined cells

# Timestamp lexical form — 6-digit microseconds; identical output from
# pandas .dt.strftime and DuckDB strftime (verified parity).
TS_FORMAT = "%Y-%m-%dT%H:%M:%S.%f"

# Error codes (side-output rows; the reference aborts a whole file on these —
# RDFWriter.java:132-134,160-162,671 — we abort exactly one conversation).
E_BAD_ROLE = "E_BAD_ROLE"        # role not in ROLES          (ERROR 9 analog, test7)
E_BAD_TOOL = "E_BAD_TOOL"        # non-null tool not in TOOLS (ERROR 9 analog)
E_DANGLING_REF = "E_DANGLING_REF"  # '#N' mention with no such turn (ERROR 6/7, test6/test15)


# --------------------------------------------------------------------------
# IRI minting (content-derived; replaces ClassName_lineNum + idCounter)
# --------------------------------------------------------------------------
def conv_iri(conv_id: str) -> str:
    return f"inst:conv/{conv_id}"


def turn_iri(conv_id: str, turn_idx: int | str) -> str:
    return f"inst:turn/{conv_id}/{turn_idx}"


def role_iri(role: str) -> str:
    return f"ont:role/{role}"


def tool_iri(tool: str) -> str:
    return f"ont:tool/{tool}"


def text_wrapper_iri(text: str) -> str:
    """Canonical wrapper instance for a string literal — one per distinct
    surface form globally (the propertyResourceMap analog, RDFWriter.java:79,
    807-819: one wrapper per (prop, type, lexical) key, reused everywhere).
    Content-derived (md5) instead of idCounter-numbered."""
    return "inst:text/" + hashlib.md5(text.encode("utf-8")).hexdigest()


def num_wrapper_iri(lexical: str) -> str:
    """Canonical wrapper for a numeric literal; the VERBATIM lexical form is
    the key ('0012' and '12' are distinct wrappers, matching the reference's
    verbatim-lexical contract, RDFWriter.java:674-704 / golden test11)."""
    return f"inst:num/{lexical}"


def dec_wrapper_iri(lexical: str) -> str:
    """Canonical wrapper for a decimal literal (verbatim lexical key —
    '12.' and '12.0' are distinct wrappers, golden test11 analog)."""
    return f"inst:dec/{lexical}"


def hex_wrapper_iri(lexical: str) -> str:
    """Canonical wrapper for a hexBinary literal (verbatim lexical key —
    case preserved: 'DEAD' and 'dead' are distinct wrappers)."""
    return f"inst:hex/{lexical}"


def logical_iri(value: str) -> str:
    """Three-valued logical named individual (TRUE/FALSE/UNKNOWN — the
    EXPRESS LOGICAL enumeration analog, RDFWriter.java:696-704)."""
    return f"ont:logical/{value}"


def list_node_iri(content_key: str, pos: int) -> str:
    """List node IRI: content-derived (md5 of the list's lexical) + cell
    position — replaces the reference's idCounter-numbered list nodes
    (RDFWriter.java:136-137) so identical (sub)lists share one node chain
    globally (test13/16 cross-sublist sharing) with zero coordination."""
    h = hashlib.md5(content_key.encode("utf-8")).hexdigest()
    return f"inst:listn/{h}/{pos}"


# Literal object encoding inside the engine's triple datasets: the `obj`
# column holds `<lexical>^^<datatype-curie>`; obj_kind distinguishes uri vs
# literal.  The N-Triples sink renders proper RDF terms from these.
XSD_INTEGER = "xsd:integer"
XSD_STRING = "xsd:string"
XSD_DATETIME = "xsd:dateTime"
XSD_DOUBLE = "xsd:double"
XSD_BOOLEAN = "xsd:boolean"
XSD_HEXBINARY = "xsd:hexBinary"


def typed_literal(lexical: str, dtype: str) -> str:
    return f"{lexical}^^{dtype}"


# --------------------------------------------------------------------------
# Compact predicate encoding.  The predicate vocabulary is CLOSED (the
# schema defines it), so the engine ships an int8 `pred_id` through its
# shuffles instead of a predicate string, and `obj_kind` is a function of
# the predicate (derived at the edges, never stored).  This cuts ~20
# bytes/row from every exchanged triple — significant when the sorted
# dedup shuffle moves the whole triple set.
# --------------------------------------------------------------------------
# (pred, obj_kind) in id order; ids are part of the internal wire format
PRED_TABLE: tuple[tuple[str, str], ...] = (
    (RDF_TYPE, "uri"),
    (P_HAS_TURN, "uri"),
    (P_TURN_INDEX, "literal"),
    (P_AT_TIME, "literal"),
    (P_HAS_ROLE, "uri"),
    (P_USED_TOOL, "uri"),
    (P_HAS_TEXT, "uri"),
    (P_HAS_STRING, "literal"),
    (P_NEXT_TURN, "uri"),
    (P_MENTIONS_NUMBER, "uri"),
    (P_HAS_INTEGER, "literal"),
    (P_MENTIONS_TURN, "uri"),
    # appended in round 2 (ids are append-only: the int8 wire format is
    # stable across versions)
    (P_MENTIONS_DECIMAL, "uri"),
    (P_HAS_DOUBLE, "literal"),
    (P_TOOL_FLAG, "literal"),
    (P_TEXT_PRESENCE, "uri"),
    (P_MENTIONS_LIST, "uri"),
    (P_HAS_CONTENTS, "uri"),
    (P_HAS_NEXT, "uri"),
    # appended in round 3 (append-only wire contract)
    (P_MENTIONS_HEX, "uri"),
    (P_HAS_HEXBINARY, "literal"),
)
PRED_ID: dict[str, int] = {p: i for i, (p, _) in enumerate(PRED_TABLE)}
PRED_NAMES: tuple[str, ...] = tuple(p for p, _ in PRED_TABLE)
PRED_KINDS: tuple[str, ...] = tuple(k for _, k in PRED_TABLE)


# --------------------------------------------------------------------------
# Compact WIRE prefix codes.  Inside the engine's shuffled triple tables
# every URI term starts with one of a CLOSED set of prefixes; the wire
# format replaces the prefix with ONE byte, cutting 4-15 bytes from each
# of subj and (uri) obj on every row the sorted-dedup exchange moves.
# Codes ascend in the prefixes' lexicographic order, so a range sort on
# encoded terms induces the same cross-prefix block order as on decoded
# terms — the sink's disjoint-subject-range manifest contract survives.
# Literal objects are NEVER encoded (arbitrary text could start with a
# code byte); decode is masked on obj_kind == 'uri'.
# --------------------------------------------------------------------------
WIRE_PREFIX_TABLE: tuple[tuple[str, str], ...] = (
    ("\x01", "inst:conv/"),
    ("\x02", "inst:dec/"),
    ("\x03", "inst:hex/"),
    ("\x04", "inst:listn/"),
    ("\x05", "inst:num/"),
    ("\x06", "inst:text/"),
    ("\x07", "inst:turn/"),
    ("\x08", "ont:Conversation"),
    ("\x0b", "ont:Turn"),      # skip \x09/\x0a (tab/newline: keep wire
    ("\x0c", "ont:logical/"),  # strings free of whitespace control bytes)
    ("\x0e", "ont:role/"),     # (\x0d CR skipped likewise)
    ("\x0f", "ont:tool/"),
)
(W_CONV, W_DEC, W_HEX, W_LISTN, W_NUM, W_TEXT, W_TURN, W_CLS_CONV,
 W_CLS_TURN, W_LOGICAL, W_ROLE, W_TOOL) = (c for c, _ in WIRE_PREFIX_TABLE)
assert [p for _, p in WIRE_PREFIX_TABLE] == sorted(p for _, p in WIRE_PREFIX_TABLE)
assert [c for c, _ in WIRE_PREFIX_TABLE] == sorted(c for c, _ in WIRE_PREFIX_TABLE)


# --------------------------------------------------------------------------
# Vocabulary-version registry — the getExpressSchema multi-version dispatch
# analog (IfcSpfReader.java:186-223, 249-307): the reference sniffs each
# file's FILE_SCHEMA header line and selects among 5 serialized schema
# dictionaries; the engine sniffs a dataset-level version tag (Parquet
# footer key-value metadata, or an explicit per-row tag) and selects the
# matching closed ROLE/TOOL vocabulary.  One run can mix generations:
# each input partition is validated under ITS OWN vocab.
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class Vocab:
    version: str
    roles: tuple[str, ...]
    tools: tuple[str, ...]


VOCAB_REGISTRY: dict[str, Vocab] = {
    "v1": Vocab("v1", ROLES, TOOLS),
    # v2 — the next vocabulary generation: 'view' became a first-class
    # role and 'mailer' a sanctioned tool (the IFC2X3->IFC4 analog: the
    # same value is an unknown enum under one schema version and a
    # NamedIndividual under the next).
    "v2": Vocab("v2", ROLES + ("view",), TOOLS + ("mailer",)),
}
DEFAULT_VOCAB_VERSION = "v1"
VOCAB_METADATA_KEY = b"vocab_version"

# composite "version#value" membership keys: per-row version dispatch
# inside extraction is ONE vectorized is_in regardless of version count
VOCAB_ROLE_KEYS: tuple[str, ...] = tuple(
    sorted(f"{v}#{r}" for v, vo in VOCAB_REGISTRY.items() for r in vo.roles)
)
VOCAB_TOOL_KEYS: tuple[str, ...] = tuple(
    sorted(f"{v}#{t}" for v, vo in VOCAB_REGISTRY.items() for t in vo.tools)
)


def sniff_vocab_version(path: str) -> str:
    """Per-file vocabulary-version sniff (the FILE_SCHEMA header-line
    analog, IfcSpfReader.java:186-223): reads ONLY the Parquet footer's
    key-value metadata — driver-side, no data IO.  Files without a tag
    are the default generation; an unknown tag is a hard error (the
    reference likewise aborts on an unsupported schema, 'Could not
    convert file with schema')."""
    import pyarrow.parquet as _pq

    # IO/parse errors PROPAGATE (ADVICE r4): a corrupt or unreadable file
    # must hard-error like the reference's unconvertible-schema abort,
    # not be silently tagged with the default generation.
    md = _pq.read_schema(path).metadata or {}
    raw = md.get(VOCAB_METADATA_KEY)
    if raw is None:
        return DEFAULT_VOCAB_VERSION
    v = raw.decode("utf-8")
    if v not in VOCAB_REGISTRY:
        raise ValueError(
            f"unknown vocab_version {v!r} in {path} "
            f"(known: {sorted(VOCAB_REGISTRY)})"
        )
    return v


# sort key giving the reference's "first-seen wins" total order for
# canonical-ID assignment (resolveDuplicates, IfcSpfParser.java:147-165):
# lexicographic on conv_id then zero-padded turn_idx.  Must match the SQL
# printf('%s#%010d', conv_id, turn_idx).
def first_seen_key(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}#{turn_idx:010d}"


@dataclass(frozen=True)
class Schema:
    """Broadcastable read-only schema object (ray.put once on the driver,
    read in every task / actor __init__ — the `ent`/`typ` dict analog,
    SURVEY.md §2.3 L1)."""

    roles: tuple[str, ...] = ROLES
    tools: tuple[str, ...] = TOOLS
    num_re: str = NUM_RE
    ref_re: str = REF_RE
    prefixes: dict[str, str] = field(default_factory=lambda: dict(PREFIXES))


DEFAULT_SCHEMA = Schema()


def expand_curie(term: str) -> str:
    """Expand a compact CURIE used inside the engine to a full IRI."""
    pfx, _, local = term.partition(":")
    base = PREFIXES.get(pfx)
    if base is None:
        return term
    return base + local
