"""Dense / ELL / CSR sparse-matrix classes and the serial cuZK pipeline.

Capability parity with the reference's textbook cuZK data structures
(reference: src/submission/miscellaneous/matrices/matrices.ts:129-419 —
DenseMatrix, ELLSparseMatrix, CSRSparseMatrix with ell_to_csr, smvp, smtvp
and transpose) and the faithful serial cuZK pipeline driver
(reference: src/submission/miscellaneous/cuzk/cuzk_serial.ts:28-169).

These operate over arbitrary group elements: any object supporting `.add(o)`
(and an `identity` element) works, including `cpu.curve.ExtPoint` — mirroring
how the reference parameterizes over FieldMath points, and how its CSR tests
substitute string concatenation for the group op
(reference: miscellaneous/tests/create_csr.test.ts:12-93).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from ..utils.params import MsmConfig
from .curve import ExtPoint
from .mirrors import decompose_scalars_signed


@dataclass
class DenseMatrix:
    """Row-major dense matrix of group elements or None (zero)."""

    data: list[list[Any]]

    @property
    def num_rows(self) -> int:
        return len(self.data)

    @property
    def num_cols(self) -> int:
        return len(self.data[0]) if self.data else 0

    def transpose(self) -> "DenseMatrix":
        return DenseMatrix([[self.data[r][c] for r in range(self.num_rows)]
                            for c in range(self.num_cols)])

    def matrix_vec_mult(self, vec: Sequence[Any], add, scale) -> list[Any]:
        """y_r = sum_c data[r][c] * vec[c] with user add/scale ops."""
        out = []
        for row in self.data:
            acc = None
            for elem, v in zip(row, vec):
                if elem is None:
                    continue
                term = scale(elem, v)
                acc = term if acc is None else add(acc, term)
            out.append(acc)
        return out


@dataclass
class ELLSparseMatrix:
    """ELL format: per row, the column indices and values of non-zeros
    (reference: matrices.ts ELLSparseMatrix)."""

    data: list[list[Any]]
    col_idx: list[list[int]]
    row_length: list[int]

    @classmethod
    def dense_to_sparse_matrix(cls, dense: DenseMatrix) -> "ELLSparseMatrix":
        data, col_idx, row_length = [], [], []
        for row in dense.data:
            vals, cols = [], []
            for c, elem in enumerate(row):
                if elem is not None:
                    vals.append(elem)
                    cols.append(c)
            data.append(vals)
            col_idx.append(cols)
            row_length.append(len(vals))
        return cls(data, col_idx, row_length)


@dataclass
class CSRSparseMatrix:
    """CSR format (reference: matrices.ts CSRSparseMatrix)."""

    data: list[Any]
    col_idx: list[int]
    row_ptr: list[int]
    num_cols: int

    @classmethod
    def ell_to_csr(cls, ell: ELLSparseMatrix, num_cols: int) -> "CSRSparseMatrix":
        data, col_idx, row_ptr = [], [], [0]
        for vals, cols in zip(ell.data, ell.col_idx):
            data.extend(vals)
            col_idx.extend(cols)
            row_ptr.append(len(data))
        return cls(data, col_idx, row_ptr, num_cols)

    @property
    def num_rows(self) -> int:
        return len(self.row_ptr) - 1

    def transpose(self) -> "CSRSparseMatrix":
        """Serial CSR -> CSC transpose: histogram, prefix sum, scatter — the
        algorithm the reference runs per subtask on the GPU
        (reference: wgsl/cuzk/transpose.wgsl:34-74, Wang et al. 2016)."""
        counts = [0] * self.num_cols
        for c in self.col_idx:
            counts[c] += 1
        new_row_ptr = [0]
        for c in counts:
            new_row_ptr.append(new_row_ptr[-1] + c)
        cursor = list(new_row_ptr[:-1])
        new_data = [None] * len(self.data)
        new_col_idx = [0] * len(self.data)
        for r in range(self.num_rows):
            for k in range(self.row_ptr[r], self.row_ptr[r + 1]):
                c = self.col_idx[k]
                pos = cursor[c]
                cursor[c] += 1
                new_data[pos] = self.data[k]
                new_col_idx[pos] = r
        return CSRSparseMatrix(new_data, new_col_idx, new_row_ptr, self.num_rows)

    def smvp(self, vec: Sequence[Any], add, scale) -> list[Any]:
        """Sparse matrix-vector product: out[r] = sum_k data[k]*vec[col[k]]
        (reference: matrices.ts smvp; the cuZK SMVP runs this on the
        transposed matrix with vec = all-ones)."""
        out = []
        for r in range(self.num_rows):
            acc = None
            for k in range(self.row_ptr[r], self.row_ptr[r + 1]):
                term = scale(self.data[k], vec[self.col_idx[k]])
                acc = term if acc is None else add(acc, term)
            out.append(acc)
        return out

    def smtvp(self, vec: Sequence[Any], add, scale) -> list[Any]:
        """Transposed product out[c] += data[k]*vec[r] (reference:
        matrices.ts smtvp; one thread per CSR row in the experimental shader
        miscellaneous/wgsl/smtvp.template.wgsl)."""
        out: list[Any] = [None] * self.num_cols
        for r in range(self.num_rows):
            for k in range(self.row_ptr[r], self.row_ptr[r + 1]):
                c = self.col_idx[k]
                term = scale(self.data[k], vec[r])
                out[c] = term if out[c] is None else add(out[c], term)
        return out


def execute_serial_cuzk(
    points: list[ExtPoint], scalars: list[int], cfg: MsmConfig
) -> ExtPoint:
    """Faithful serial cuZK MSM over the matrix classes: build the ELL matrix
    per window, convert to CSR, transpose, SMVP (bucket sums), running-sum
    bucket reduction, Horner (reference:
    miscellaneous/cuzk/cuzk_serial.ts:28-169 `cuzk_typescript_serial`)."""
    n = len(points)
    c = cfg.chunk_size
    w = cfg.num_windows
    nb = cfg.num_buckets
    digits = decompose_scalars_signed(scalars, w, c)
    ident = ExtPoint(0, 1, 0, 1)

    window_sums = []
    for win in range(w):
        # ELL: one row per point, one entry at column |digit|-1 (signed).
        data, col_idx, row_len = [], [], []
        for i in range(n):
            d = digits[i][win]
            if d == 0:
                data.append([])
                col_idx.append([])
                row_len.append(0)
                continue
            pt = points[i] if d > 0 else points[i].neg()
            data.append([pt])
            col_idx.append([abs(d) - 1])
            row_len.append(1)
        ell = ELLSparseMatrix(data, col_idx, row_len)
        csr = CSRSparseMatrix.ell_to_csr(ell, nb)
        csc = csr.transpose()
        buckets = csc.smvp([1] * csc.num_cols, add=lambda a, b: a.add(b),
                           scale=lambda pt, one: pt)
        # Running-sum bucket reduction: sum_b (b+1)*bucket[b].
        m = ident
        g = ident
        for b in range(nb - 1, -1, -1):
            if buckets[b] is not None:
                m = m.add(buckets[b])
            g = g.add(m)
        window_sums.append(g)

    acc = window_sums[-1]
    for win in range(w - 2, -1, -1):
        for _ in range(c):
            acc = acc.add(acc)
        acc = acc.add(window_sums[win])
    return acc
