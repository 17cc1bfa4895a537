from .tables import TABLES, load_table, register_views  # noqa: F401
from .generator import generate_sample_items  # noqa: F401
