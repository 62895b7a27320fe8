from tgq.utils.logging import setup_logging
