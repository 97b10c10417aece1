"""Importable targets for declarative `kind = "python"` resources
(tests reference them as dotted paths, `decl_helpers:gen_rows`)."""


def gen_rows():
    for i in range(1, 51):
        yield {"id": i, "amount": float(i) * 10.0}


def gen_rows_ctx(context):
    """Context-aware generator: pushes the cursor to its 'upstream'."""
    start = context.cursor.get("id") or 0
    for i in range(int(start) + 1, 51):
        yield {"id": i, "amount": float(i) * 10.0}
