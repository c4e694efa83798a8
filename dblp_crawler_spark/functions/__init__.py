from .text import (  # noqa: F401
    ccf_rank_col,
    journal_key,
    journal_name,
    keyword_cnf_match,
    keyword_weak_match,
    strip_html_suffix,
    title_hash,
    tokenize,
    url2doi,
)
from .priority import priority_col  # noqa: F401
from .hashing import salted_repartition, url_hash  # noqa: F401
