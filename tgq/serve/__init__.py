from tgq.serve.kv_cache import PagedKVCache, PageTable
from tgq.serve.engine import Engine, ServeConfig, Request
