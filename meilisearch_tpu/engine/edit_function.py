"""Edit documents by function.

Reference: milli/src/update/new/indexer/update_by_function.rs — a sandboxed
script runs against each matching document with `doc` in scope; assigning to
`doc` fields edits the document, setting `doc` to an empty state removes it.
The reference embeds rhai; here the function body is a restricted Python
statement suite evaluated with no builtins (same embedded-script trust model,
enabled only behind the `editDocumentsByFunction` experimental feature).
"""

from __future__ import annotations

from typing import Optional

from ..types.errors import EngineError, ErrorCode


class _DocProxy(dict):
    """Attribute-style access so `doc.title = ...` works like rhai."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            return None

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        self.pop(name, None)


_SAFE_BUILTINS = {
    "len": len,
    "str": str,
    "int": int,
    "float": float,
    "abs": abs,
    "min": min,
    "max": max,
    "round": round,
    "sorted": sorted,
}


def edit_documents_by_function(
    store, function: str, filter_expr, context: Optional[dict]
) -> tuple[int, int]:
    if not isinstance(function, str) or not function.strip():
        raise EngineError(
            ErrorCode.BAD_REQUEST, "Missing field `function`"
        )
    try:
        code = compile(function, "<edit-function>", "exec")
    except SyntaxError as err:
        raise EngineError(
            ErrorCode.BAD_REQUEST,
            f"Error in `function`: {err}",
        )

    docids = sorted(store.documents.keys())
    if filter_expr is not None:
        from ..search.filters import evaluate_filter

        allowed = evaluate_filter(
            store, filter_expr, code=ErrorCode.INVALID_DOCUMENT_FILTER
        )
        docids = [d for d in docids if d in allowed]

    edited = 0
    to_update: list[dict] = []
    to_delete: list[str] = []
    for docid in docids:
        original = store.documents[docid]
        doc = _DocProxy({k: v for k, v in original.items()})
        scope = {
            "__builtins__": _SAFE_BUILTINS,
            "doc": doc,
            "context": context or {},
        }
        try:
            exec(code, scope)  # noqa: S102 — sandboxed, feature-gated
        except Exception as err:
            raise EngineError(
                ErrorCode.BAD_REQUEST,
                f"Error while running the function on document"
                f" `{store.internal_to_external.get(docid)}`: {err}",
            )
        new_doc = scope.get("doc")
        if not new_doc:
            to_delete.append(store.internal_to_external[docid])
            edited += 1
        elif dict(new_doc) != original:
            to_update.append(dict(new_doc))
            edited += 1
    if to_update:
        store.add_documents(to_update, method="replace")
    if to_delete:
        store.delete_documents(to_delete)
    return edited, len(docids)
