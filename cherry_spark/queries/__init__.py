"""Import all query modules so their ``@query`` registrations run."""

import cherry_spark.queries.relational  # noqa: F401
