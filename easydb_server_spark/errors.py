"""Typed engine errors → HTTP codes.

Mirrors the reference's error envelope (`src/response/http_error.rs:29-97`):
every error maps to an HTTP status and a ``{resp_msg, resp_code: 1}``
JSON body; success is ``{resp_msg: "successful", resp_code: 0, data}``.
"""

from __future__ import annotations


class EasyDBError(Exception):
    """Base engine error."""

    status = 500

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


class BadRequestError(EasyDBError):
    status = 400


class NotFoundError(EasyDBError):
    status = 404


class UnsupportedSQLError(EasyDBError):
    """Statement classification rejection (reference 422,
    `src/sql/parse.rs:142-150`)."""

    status = 422


class UnsupportedFormatError(EasyDBError):
    """Unknown/rejected file format (e.g. whole-file `.json`,
    `src/data_source/context.rs:58-62`)."""

    status = 422


class EmptyTableNameError(EasyDBError):
    """Query references no tables (`src/data_source/context.rs:86-88`)."""

    status = 422
