"""The operator/query library.

Importing this package registers every query into the registry; the driver
contract (``__spark_entry__.py``) re-exports the registry dicts.
"""

from csv_loader_spark.queries.registry import all_oracles, all_queries, get

# Import for registration side effects.
from csv_loader_spark.queries import relational  # noqa: E402,F401
from csv_loader_spark.queries import relational2  # noqa: E402,F401
from csv_loader_spark.queries import relational3  # noqa: E402,F401
from csv_loader_spark.queries import relational4  # noqa: E402,F401
from csv_loader_spark.queries import relational5  # noqa: E402,F401
from csv_loader_spark.queries import analytics  # noqa: E402,F401
from csv_loader_spark.queries import analytics2  # noqa: E402,F401
from csv_loader_spark.queries import llm  # noqa: E402,F401
from csv_loader_spark.queries import llm2  # noqa: E402,F401
from csv_loader_spark.queries import llm3  # noqa: E402,F401
from csv_loader_spark.queries import llm4  # noqa: E402,F401
from csv_loader_spark.queries import llm5  # noqa: E402,F401
from csv_loader_spark.queries import llm6  # noqa: E402,F401
from csv_loader_spark.queries import llm7  # noqa: E402,F401
from csv_loader_spark.queries import llm8  # noqa: E402,F401
from csv_loader_spark.queries import llm9  # noqa: E402,F401
from csv_loader_spark.queries import llm10  # noqa: E402,F401
from csv_loader_spark.queries import llm11  # noqa: E402,F401
from csv_loader_spark.queries import llm12  # noqa: E402,F401
from csv_loader_spark.queries import llm13  # noqa: E402,F401
from csv_loader_spark.queries import llm14  # noqa: E402,F401
from csv_loader_spark.queries import analytics3  # noqa: E402,F401
from csv_loader_spark.queries import analytics4  # noqa: E402,F401
from csv_loader_spark.queries import analytics5  # noqa: E402,F401
from csv_loader_spark.queries import analytics6  # noqa: E402,F401
from csv_loader_spark.queries import analytics7  # noqa: E402,F401
from csv_loader_spark.queries import geo  # noqa: E402,F401
from csv_loader_spark.queries import retrieval  # noqa: E402,F401
from csv_loader_spark.queries import parity  # noqa: E402,F401

__all__ = ["all_queries", "all_oracles", "get"]
