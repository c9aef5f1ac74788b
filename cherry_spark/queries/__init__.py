"""Import all query modules so their ``@query`` registrations run."""

import cherry_spark.queries.relational  # noqa: F401
import cherry_spark.queries.steps  # noqa: F401
import cherry_spark.queries.extensions  # noqa: F401
import cherry_spark.queries.analytics  # noqa: F401
import cherry_spark.queries.curation  # noqa: F401
import cherry_spark.queries.multimodal  # noqa: F401
