from .corpus import (make_seed_urls, fetch_outcome, link_children, make_spans,
                     doc_id_for_url, spans_arrow_type)
from .readers import read_table, read_items_file

__all__ = ["make_seed_urls", "fetch_outcome", "link_children", "make_spans",
           "doc_id_for_url", "spans_arrow_type", "read_table", "read_items_file"]
