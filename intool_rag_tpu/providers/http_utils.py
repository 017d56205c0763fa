"""HTTP retry helper (reference: rag/helper/http_utils.py:45-125).

Exponential backoff on connect/timeout/5xx with typed errors; a shared
httpx client pool sized from config.
"""

from __future__ import annotations

import time

import httpx

from ..config import get_config
from ..exceptions import ProviderConnectionError, ProviderTimeoutError
from ..logging import get_logger

logger = get_logger(__name__)

_client: httpx.Client | None = None


def get_http_client() -> httpx.Client:
    global _client
    if _client is None:
        cfg = get_config()
        _client = httpx.Client(
            timeout=httpx.Timeout(
                connect=cfg.HTTP_CONNECT_TIMEOUT,
                read=cfg.HTTP_READ_TIMEOUT,
                write=cfg.HTTP_WRITE_TIMEOUT,
                pool=cfg.HTTP_POOL_TIMEOUT,
            ),
            limits=httpx.Limits(
                max_connections=cfg.HTTP_MAX_CONNECTIONS,
                max_keepalive_connections=cfg.HTTP_MAX_KEEPALIVE_CONNECTIONS,
            ),
        )
    return _client


def request_with_retry(method: str, url: str, **kwargs) -> httpx.Response:
    cfg = get_config()
    last_exc: Exception | None = None
    for attempt in range(cfg.HTTP_MAX_RETRIES + 1):
        try:
            resp = get_http_client().request(method, url, **kwargs)
            if resp.status_code >= 500:
                raise ProviderConnectionError(
                    f"{url} returned {resp.status_code}"
                )
            return resp
        except (httpx.ConnectError, httpx.ConnectTimeout, ProviderConnectionError) as exc:
            last_exc = ProviderConnectionError(str(exc))
        except (httpx.ReadTimeout, httpx.WriteTimeout, httpx.PoolTimeout) as exc:
            last_exc = ProviderTimeoutError(str(exc))
        if attempt < cfg.HTTP_MAX_RETRIES:
            delay = cfg.HTTP_RETRY_DELAY * (2**attempt)
            logger.warning("retrying %s in %.1fs (%s)", url, delay, last_exc)
            time.sleep(delay)
    raise last_exc  # type: ignore[misc]
