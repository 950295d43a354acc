"""Query security validation — the reference's validateQuery /
checkInjectionPatterns (server/query/duckdb/engine.go:613-706): an
allowed-statement prefix whitelist, a blocked-keyword scan, and the
SQL-injection pattern set, all raising typed errors.

Semantics replicate the reference EXACTLY, including its quirks:
keyword blocking uses substring containment (strings.Contains,
engine.go:644-652), so with the default blocklist an
``UPDATE … SET …`` statement trips the blocked keyword ``SET`` — the
reference behaves identically, which is presumably why it ships with
``EnableQueryValidation: false`` (engine.go:55). Validation here is
likewise opt-in (``Engine(query_validation=True)`` or standalone
``validate_query``), and both lists are caller-configurable.
"""

from __future__ import annotations

import re

from ranger_spark.errors import RangerError

SECURITY_VIOLATION = "security.validation_failed"

# engine.go:56-60 AllowedStatements
DEFAULT_ALLOWED_STATEMENTS = (
    "SELECT", "SHOW", "DESCRIBE", "EXPLAIN", "WITH",
    "CREATE", "INSERT", "UPDATE", "DELETE", "DROP",
)

# engine.go:61-64 BlockedKeywords
DEFAULT_BLOCKED_KEYWORDS = (
    "COPY", "ATTACH", "DETACH", "LOAD", "INSTALL",
    "PRAGMA", "SET", "RESET", "CALL", "EXPORT",
    "IMPORT", "FORCE", "CHECKPOINT", "VACUUM",
)

# engine.go:664-689 injection pattern table, verbatim (Go regex → re)
INJECTION_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"--", "sql_comment_injection"),
    (r"/\*", "sql_comment_injection"),
    (r"\*/", "sql_comment_injection"),
    (r";\s*DROP", "drop_injection"),
    (r";\s*DELETE", "delete_injection"),
    (r";\s*UPDATE", "update_injection"),
    (r";\s*INSERT", "insert_injection"),
    (r";\s*CREATE", "create_injection"),
    (r";\s*ALTER", "alter_injection"),
    (r"UNION\s+SELECT", "union_injection"),
    (r"OR\s+1\s*=\s*1", "boolean_injection"),
    (r"AND\s+1\s*=\s*1", "boolean_injection"),
    (r"'\s*OR\s*'", "quote_injection"),
    (r'"\s*OR\s*"', "quote_injection"),
    (r"EXEC\s*\(", "exec_injection"),
    (r"EXECUTE\s*\(", "exec_injection"),
    (r"CHAR\s*\(", "char_injection"),
    (r"ASCII\s*\(", "ascii_injection"),
    (r"CONCAT\s*\(.*SELECT", "concat_injection"),
)


def validate_query(
    query: str,
    allowed_statements: tuple[str, ...] = DEFAULT_ALLOWED_STATEMENTS,
    blocked_keywords: tuple[str, ...] = DEFAULT_BLOCKED_KEYWORDS,
    check_injection: bool = True,
) -> None:
    """Raise RangerError(SECURITY_VIOLATION) on a violation; the error's
    ``reason`` context carries the reference's SecurityError.Reason."""
    normalized = query.strip().upper()
    if not normalized:
        raise RangerError(
            SECURITY_VIOLATION, "empty query not allowed",
            reason="empty_query",
        )
    if allowed_statements and not normalized.startswith(
        tuple(s.upper() for s in allowed_statements)
    ):
        raise RangerError(
            SECURITY_VIOLATION, "statement type not allowed",
            reason="disallowed_statement",
        )
    for kw in blocked_keywords:
        # strings.Contains parity (engine.go:644-652): substring, not
        # word-boundary — see the module docstring for the consequences
        if kw.upper() in normalized:
            raise RangerError(
                SECURITY_VIOLATION,
                f"blocked keyword '{kw}' detected",
                reason="blocked_keyword",
            )
    if check_injection:
        for pattern, reason in INJECTION_PATTERNS:
            if re.search(pattern, normalized):
                raise RangerError(
                    SECURITY_VIOLATION,
                    f"potential SQL injection detected: {reason}",
                    reason=reason,
                )
