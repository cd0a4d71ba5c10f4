"""Driver-side Medea schema compiler (pure Python, no Spark).

Pipeline (reference parity: src/Data/Medea/Loader.hs buildSchema):
bytes → UTF-8 text → parsed schema specs → compiled acyclic graph.
"""

from medea_spark.compiler.analyzer import (
    ANY_NODE,
    CompiledSchema,
    Node,
    SchemaGraph,
    compile_schema_text,
    compile_schemata,
    custom_node,
    ident_to_node,
    prim_node,
)
from medea_spark.compiler.diff import is_backward_compatible, schema_diff
from medea_spark.compiler.infer import infer_schema_text
from medea_spark.compiler.errors import (
    MedeaAnalysisError,
    MedeaError,
    MedeaParseError,
    NotUtf8Error,
)
from medea_spark.compiler.parser import (
    ArraySpec,
    ObjectSpec,
    PropertySpec,
    SchemaSpec,
    parse_schema_text,
)


def load_schema(path: str) -> SchemaGraph:
    """Compile a schema graph file from disk (reference: Loader.hs:109-112)."""
    with open(path, "rb") as fh:
        return compile_schema_text(fh.read())


__all__ = [
    "is_backward_compatible",
    "schema_diff",
    "infer_schema_text",
    "ANY_NODE",
    "ArraySpec",
    "CompiledSchema",
    "MedeaAnalysisError",
    "MedeaError",
    "MedeaParseError",
    "Node",
    "NotUtf8Error",
    "ObjectSpec",
    "PropertySpec",
    "SchemaGraph",
    "SchemaSpec",
    "compile_schema_text",
    "compile_schemata",
    "custom_node",
    "ident_to_node",
    "load_schema",
    "parse_schema_text",
    "prim_node",
]
