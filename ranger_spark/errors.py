"""Reference-style structured errors (pattern of reference pkg/errors:
stable dot-separated codes + message + context), raised by the type
validator, router, and engine."""

from __future__ import annotations


class RangerError(Exception):
    """Engine error with a stable machine-readable code."""

    def __init__(self, code: str, message: str, **context):
        self.code = code
        self.context = context
        super().__init__(message)

    def __str__(self) -> str:  # "code: message (k=v, ...)"
        base = f"{self.code}: {super().__str__()}"
        if self.context:
            ctx = ", ".join(f"{k}={v!r}" for k, v in sorted(self.context.items()))
            base += f" ({ctx})"
        return base


# Codes mirroring the reference's error taxonomy
# (server/query/parser/errors.go, pkg/errors usage sites).
UNSUPPORTED_SQL_TYPE = "types.unsupported_sql_type"
INVALID_ICEBERG_TYPE = "types.invalid_iceberg_type"
COMPLEX_TYPE_PARSE_ERROR = "types.complex_type_parse_error"
MISSING_SEMICOLON = "parser.missing_semicolon"
EMPTY_STATEMENT = "parser.empty_statement"
UNSUPPORTED_STATEMENT = "engine.unsupported_statement_type"
DATABASE_NOT_FOUND = "engine.database_not_found"
TABLE_NOT_FOUND = "engine.table_not_found"
ALREADY_EXISTS = "engine.already_exists"
VALIDATION_FAILED = "storage.validation_failed"
RESULT_TRUNCATED = "engine.result_truncated"  # informational, not raised
