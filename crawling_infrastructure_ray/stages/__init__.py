from .fetch import FetchSim, fetch_sim_batch
from .html import clean_html_batch, extract_links_batch

__all__ = ["FetchSim", "clean_html_batch", "extract_links_batch"]
