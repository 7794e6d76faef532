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
            app.auth.authenticate(req.auth_token, "search", query["indexUid"])
        # group per index so chain-compatible queries share device batches
        # (SURVEY §2.6 batched query execution)
        from ..search.perform import perform_search_many

        by_index: dict[str, list[int]] = {}
        for i, query in enumerate(queries):
            by_index.setdefault(query["indexUid"], []).append(i)
        results: list = [None] * len(queries)
        for index_uid, idxs in by_index.items():
            store = app.scheduler.index(index_uid)
            bodies = [
                {k: v for k, v in queries[i].items() if k != "indexUid"}
                for i in idxs
            ]
            for i, res in zip(idxs, perform_search_many(store, bodies)):
                results[i] = {"indexUid": index_uid, **res}
        return {"results": results}

    # -- federated ---------------------------------------------------------
    started = time.perf_counter()
    limit = int(federation.get("limit", 20) or 20)
    offset = int(federation.get("offset", 0) or 0)

    all_hits: list[tuple[float, int, dict]] = []
    seen_pairs: dict[tuple[str, str], float] = {}
    remote_errors: dict[str, dict] = {}

    # partition queries by remote and proxy them over HTTP
    # (reference: federated/proxy.rs — header Meili-Proxy-Search: true)
    remote_queries: dict[str, list[tuple[int, dict]]] = {}
    local_queries: list[tuple[int, dict]] = []
    for qi, query in enumerate(queries):
        remote_name = (query.get("federationOptions") or {}).get("remote")
        if remote_name:
            remote_queries.setdefault(remote_name, []).append((qi, query))
        else:
            local_queries.append((qi, query))

    for remote_name, entries in remote_queries.items():
        remote = (app.scheduler.network.get("remotes") or {}).get(remote_name)
        if remote is None:
            raise EngineError(
                ErrorCode.BAD_REQUEST,
                f"Invalid `queries[{entries[0][0]}].federationOptions.remote`:"
                f" remote `{remote_name}` is not registered",
            )
        try:
            hits = _proxy_search(remote_name, remote, federation, entries)
            for score, qi, hit in hits:
                all_hits.append((score, qi, hit))
        except EngineError:
            raise
        except Exception as err:
            remote_errors[remote_name] = {
                "message": str(err),
                "code": "remote_bad_response",
                "type": "system",
                "link": "https://docs.meilisearch.com/errors#remote_bad_response",
            }

    for qi, query in local_queries:
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

        filter_docids = evaluate_filter(store, query.get("filter"), as_array=True)
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
    if remote_errors:
        response["remoteErrors"] = remote_errors
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


def _proxy_search(remote_name: str, remote: dict, federation: dict, entries):
    """POST /multi-search on a remote (reference: federated/proxy.rs:16)."""
    import urllib.request

    from ..utils.http_policy import check_url_policy

    url = remote["url"].rstrip("/") + "/multi-search"
    check_url_policy(url)
    sub_queries = []
    for _qi, query in entries:
        q = dict(query)
        # strip the remote marker so the target treats it as local, keep the
        # weight; request scores for the merge
        opts = dict(q.get("federationOptions") or {})
        opts.pop("remote", None)
        q["federationOptions"] = opts
        q["showRankingScore"] = True
        sub_queries.append(q)
    body = json.dumps(
        {
            "federation": {
                "limit": int(federation.get("limit", 20) or 20)
                + int(federation.get("offset", 0) or 0),
                "offset": 0,
            },
            "queries": sub_queries,
        }
    ).encode("utf-8")
    req = urllib.request.Request(
        url,
        data=body,
        headers={
            "Content-Type": "application/json",
            "Meili-Proxy-Search": "true",
        },
    )
    if remote.get("searchApiKey"):
        req.add_header("Authorization", f"Bearer {remote['searchApiKey']}")
    with urllib.request.urlopen(req, timeout=30) as resp:
        data = json.loads(resp.read().decode("utf-8"))
    out = []
    qi_base = entries[0][0]
    for hit in data.get("hits", []):
        fed = hit.get("_federation") or {}
        score = float(fed.get("weightedRankingScore", 1.0))
        # remap the remote's query position to ours
        pos = fed.get("queriesPosition", 0)
        local_qi = entries[pos][0] if pos < len(entries) else qi_base
        fed["queriesPosition"] = local_qi
        fed["remote"] = remote_name
        hit["_federation"] = fed
        out.append((score, local_qi, hit))
    return out


import json  # noqa: E402
