from .crawl import run_crawl, direct_crawl, CrawlResult

__all__ = ["run_crawl", "direct_crawl", "CrawlResult"]
