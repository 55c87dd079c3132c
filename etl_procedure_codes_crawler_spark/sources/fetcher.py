"""Pluggable page fetchers for the extraction operator (SURVEY §2.1 S6).

The reference drives one global logged-in headless Chrome on the driver
process (``crawler/src/utils/chrome_config.py:3-17`` +
``utils/login.py:12-88``) and fetches pages serially. That cannot
distribute; here fetching happens inside ``mapInPandas`` partitions, so
each partition owns one fetcher built by a picklable *factory*:

- :class:`FixtureFetcher` — serves HTML from an in-memory dict or a
  directory of ``<code>.html`` files; used in tests and the correctness
  harness (no network, no browser).
- :class:`HttpFetcher` — ``requests``-based with bounded retries and an
  optional login hook; one authenticated session per partition replaces
  the reference's global browser session (SURVEY §7 "what's hard").

A fetch returns a :class:`FetchResult` carrying the html, the FINAL
url (post-redirect — the reference classifies CPT vs HCPCS from
``driver.current_url`` at ``procedure_code.py:550``, which reflects
redirects; a fetcher that hides the final URL breaks that), and an
error. Failures become ``status='fetch_error'`` rows instead of
crashing the partition (the reference's bare ``return None`` at
``procedure_code.py:650-651`` crashed the chunk loop).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol


@dataclass
class FetchResult:
    html: str | None = None
    url: str | None = None  # final URL after redirects, when known
    error: str | None = None


class Fetcher(Protocol):
    def fetch(self, code: str) -> FetchResult:
        """html set on success, error set on failure; url when known."""
        ...

    def close(self) -> None: ...


#: A picklable zero-arg callable building a Fetcher inside the executor.
FetcherFactory = Callable[[], Fetcher]


@dataclass
class FixtureFetcher:
    """Serves canned HTML — from ``pages`` and/or ``<code>.html`` files
    under ``directory``. ``urls`` optionally maps a code to the final
    URL the live site would land on (drives CPT/HCPCS classification in
    tests). Unknown codes are a fetch error (covers the network-failure
    path)."""

    pages: dict[str, str] = field(default_factory=dict)
    directory: str | None = None
    urls: dict[str, str] = field(default_factory=dict)

    def fetch(self, code: str) -> FetchResult:
        code = (code or "").strip()
        url = self.urls.get(code)
        if code in self.pages:
            return FetchResult(html=self.pages[code], url=url)
        if self.directory:
            path = os.path.join(self.directory, f"{code}.html")
            if os.path.exists(path):
                with open(path, encoding="utf-8") as handle:
                    return FetchResult(html=handle.read(), url=url)
        return FetchResult(error=f"no fixture for code {code!r}", url=url)

    def close(self) -> None:
        pass


@dataclass
class HttpFetcher:
    """HTTP fetcher with bounded retry/backoff; one per partition.

    ``login`` runs once against the session before the first fetch,
    replacing the reference's driver-global Selenium login flow
    (``utils/login.py:12-88``). The multi-step form dance is a site
    concern injected by the caller, not engine logic.
    """

    base_url: str
    login: Callable[[object], None] | None = None
    timeout: float = 30.0
    max_retries: int = 3
    backoff: float = 1.0

    def __post_init__(self) -> None:
        import requests

        self._session = requests.Session()
        if self.login is not None:
            self.login(self._session)

    def fetch(self, code: str) -> FetchResult:
        url = self.base_url + (code or "").strip()
        last_error = "no attempts made"
        for attempt in range(self.max_retries):
            try:
                response = self._session.get(url, timeout=self.timeout)
                if response.status_code == 404:
                    # 404 bodies are parseable (container404 page): pass through
                    return FetchResult(html=response.text, url=str(response.url))
                response.raise_for_status()
                # response.url is the post-redirect URL — the analog of the
                # reference's driver.current_url (procedure_code.py:550).
                return FetchResult(html=response.text, url=str(response.url))
            except Exception as exc:
                last_error = repr(exc)
                # no sleep after the FINAL attempt: the longest backoff
                # would otherwise be spent immediately before returning
                # the error (hours of dead time across a partition of
                # permanently-failing codes)
                if attempt < self.max_retries - 1:
                    time.sleep(self.backoff * (2**attempt))
        return FetchResult(error=last_error, url=url)

    def close(self) -> None:
        self._session.close()
