"""Multi-search and federated search.

Reference: routes/multi_search.rs + search/federated/perform.rs — in
non-federated mode each query runs independently; in federation mode hits
from all queries are merged by weighted ranking score, each annotated with
`_federation` metadata. Remote queries are proxied over HTTP
(federated/proxy.rs) when a network topology is configured.
"""

from __future__ import annotations

import time
from typing import Any

from ..search.perform import build_hits, perform_search
from ..types.errors import EngineError, ErrorCode


def perform_multi_search(app, req) -> dict:
    body = req.body or {}
    queries = body.get("queries")
    federation = body.get("federation")
    if not isinstance(queries, list):
        raise EngineError(
            ErrorCode.BAD_REQUEST,
            "Missing field `queries`: expected an array of queries.",
        )

    if federation is None:
        results = []
        for i, query in enumerate(queries):
            index_uid = query.get("indexUid")
            if not isinstance(index_uid, str):
                raise EngineError(
                    ErrorCode.BAD_REQUEST,
                    f"Invalid value at `.queries[{i}].indexUid`: expected a"
                    " string.",
                )
            if "federationOptions" in query:
                raise EngineError(
                    ErrorCode.BAD_REQUEST,
                    f"Inside `.queries[{i}]`: Using federation options is not"
                    " allowed in a non-federated search.\n - Hint: remove"
                    " `federationOptions` from query #"
                    f"{i} or add `federation` to the request.",
                )
            app.auth.authenticate(req.auth_token, "search", index_uid)
            store = app.scheduler.index(index_uid)
            q = {k: v for k, v in query.items() if k != "indexUid"}
            res = perform_search(store, q)
            res = {"indexUid": index_uid, **res}
            results.append(res)
        return {"results": results}

    # -- federated ---------------------------------------------------------
    started = time.perf_counter()
    limit = int(federation.get("limit", 20) or 20)
    offset = int(federation.get("offset", 0) or 0)

    all_hits: list[tuple[float, int, dict]] = []
    seen_pairs: dict[tuple[str, str], float] = {}
    per_index_hits: dict[str, list] = {}

    for qi, query in enumerate(queries):
        index_uid = query.get("indexUid")
        if not isinstance(index_uid, str):
            raise EngineError(
                ErrorCode.BAD_REQUEST,
                f"Invalid value at `.queries[{qi}].indexUid`: expected a string.",
            )
        fed_opts = query.get("federationOptions") or {}
        weight = float(fed_opts.get("weight", 1.0))
        if weight < 0:
            raise EngineError(
                ErrorCode.BAD_REQUEST,
                f"Invalid value at `.queries[{qi}].federationOptions.weight`:"
                " the value must be positive.",
            )
        for forbidden in ("offset", "limit", "page", "hitsPerPage"):
            if forbidden in query:
                raise EngineError(
                    ErrorCode.BAD_REQUEST,
                    f"Inside `.queries[{qi}]`: Using pagination options is not"
                    f" allowed in federated queries.\n - Hint: remove"
                    f" `{forbidden}` from query #{qi} or remove `federation`"
                    " from the request.",
                )
        app.auth.authenticate(req.auth_token, "search", index_uid)
        store = app.scheduler.index(index_uid)

        from ..search.executor import Search
        from ..search.filters import evaluate_filter

        filter_docids = evaluate_filter(store, query.get("filter"))
        search = Search(
            store,
            query=query.get("q"),
            filter_docids=filter_docids,
            offset=0,
            limit=offset + limit,
            sort_criteria=[query["sort"]] if isinstance(query.get("sort"), str)
            else query.get("sort"),
            terms_matching_strategy=query.get("matchingStrategy", "last"),
            attributes_to_search_on=query.get("attributesToSearchOn"),
            compute_scores=True,
        )
        result = search.execute()
        hits = build_hits(store, query, result.documents_ids, query.get("q"))
        for docid, hit in zip(result.documents_ids, hits):
            score = result.scores_by_docid.get(docid, 1.0) * weight
            ext = store.internal_to_external.get(docid, str(docid))
            key = (index_uid, ext)
            if key in seen_pairs and seen_pairs[key] >= score:
                continue
            seen_pairs[key] = score
            hit = dict(hit)
            hit["_federation"] = {
                "indexUid": index_uid,
                "queriesPosition": qi,
                "weightedRankingScore": round(score, 10),
            }
            all_hits.append((score, qi, hit))

    # stable merge: score desc, then query position asc
    all_hits.sort(key=lambda x: (-x[0], x[1]))
    # dedup (index, docid) keeping best score
    deduped = []
    emitted = set()
    for score, qi, hit in all_hits:
        key = (hit["_federation"]["indexUid"], str(hit.get("id", id(hit))))
        fkey = (
            hit["_federation"]["indexUid"],
            json.dumps(hit, sort_keys=True, default=str)[:64]
            if "id" not in hit
            else str(hit["id"]),
        )
        if fkey in emitted:
            continue
        emitted.add(fkey)
        deduped.append(hit)

    page = deduped[offset : offset + limit]
    response: dict[str, Any] = {
        "hits": page,
        "processingTimeMs": int((time.perf_counter() - started) * 1000),
        "limit": limit,
        "offset": offset,
        "estimatedTotalHits": len(deduped),
    }
    if federation.get("facetsByIndex"):
        facets_by_index = {}
        from ..search.facets import facet_distribution

        for index_uid, facets in federation["facetsByIndex"].items():
            store = app.scheduler.index(index_uid)
            dist, stats = facet_distribution(store, facets, None)
            facets_by_index[index_uid] = {
                "distribution": dist,
                "stats": stats,
            }
        response["facetsByIndex"] = facets_by_index
    return response


import json  # noqa: E402
