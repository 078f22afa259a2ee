"""Dependency-free ASGI app serving a :class:`GraphQLService`.

The reference ships a runnable ASGI server (strawberry.asgi.GraphQL,
reference middleware.py:41-65); this is the same surface on the bare ASGI
protocol — no strawberry/starlette/fastapi in the environment, and none
needed: GraphQL-over-HTTP is one POST endpoint.

* ``POST /`` — ``{"query": ..., "variables": ...}`` → ``{"data": ...,
  "errors": [...], "extensions": {"metrics": ...}}``. Execution is
  synchronous (Spark jobs block anyway) and runs in a thread via
  ``asyncio.to_thread`` so the event loop stays responsive.
* ``GET /`` — a minimal GraphiQL page (CDN assets), like the reference's
  debug mode.

Run with any ASGI server: ``uvicorn app:app`` where
``app = GraphQLApp(GraphQLService(...))``.
"""

from __future__ import annotations

import asyncio
import json

from graphique_spark.service import GraphQLService

_GRAPHIQL = """<!DOCTYPE html>
<html><head><title>graphique-spark</title>
<link rel="stylesheet" href="https://unpkg.com/graphiql/graphiql.min.css"/>
</head><body style="margin:0"><div id="graphiql" style="height:100vh"></div>
<script src="https://unpkg.com/react/umd/react.production.min.js"></script>
<script src="https://unpkg.com/react-dom/umd/react-dom.production.min.js"></script>
<script src="https://unpkg.com/graphiql/graphiql.min.js"></script>
<script>
ReactDOM.render(
  React.createElement(GraphiQL, {fetcher: GraphiQL.createFetcher({url: window.location.href})}),
  document.getElementById('graphiql'));
</script></body></html>"""


class GraphQLApp:
    def __init__(self, service: GraphQLService, graphiql: bool = True, metrics: bool = False):
        self.service = service
        self.graphiql = graphiql
        self.metrics = metrics

    async def __call__(self, scope, receive, send):
        if scope["type"] == "lifespan":  # uvicorn startup/shutdown handshake
            while True:
                message = await receive()
                if message["type"] == "lifespan.startup":
                    await send({"type": "lifespan.startup.complete"})
                elif message["type"] == "lifespan.shutdown":
                    await send({"type": "lifespan.shutdown.complete"})
                    return
        if scope["type"] != "http":
            raise ValueError(f"unsupported scope type: {scope['type']!r}")
        method = scope["method"]
        if method == "GET" and self.graphiql:
            await _respond(send, 200, _GRAPHIQL.encode(), "text/html")
        elif method == "POST":
            body = b""
            while True:
                message = await receive()
                body += message.get("body", b"")
                if not message.get("more_body"):
                    break
            try:
                payload = json.loads(body or b"{}")
                query = payload["query"]
            except (ValueError, KeyError, TypeError):
                # TypeError: valid JSON that isn't an object ([1], "x") —
                # payload["query"] indexing must 400, not crash to a 500
                await _respond(send, 400, b'{"errors": [{"message": "invalid request"}]}')
                return
            result = await asyncio.to_thread(
                self.service.run, query, payload.get("variables"), self.metrics
            )
            await _respond(send, 200, json.dumps(result, default=str).encode())
        else:
            await _respond(send, 405, b'{"errors": [{"message": "method not allowed"}]}')


async def _respond(send, status: int, body: bytes, content_type: str = "application/json"):
    await send(
        {
            "type": "http.response.start",
            "status": status,
            "headers": [
                (b"content-type", content_type.encode()),
                (b"content-length", str(len(body)).encode()),
            ],
        }
    )
    await send({"type": "http.response.body", "body": body})
