"""Minimal xarray-compatible shim for executing the reference data_utils.

The reference implementation (/root/reference/climsim_utils/data_utils.py)
depends on xarray, which is not installed in this image.  This module
implements exactly the slice of the xarray API that data_utils touches --
named-dimension arrays, dim-name broadcasting arithmetic, dataset
inner-join arithmetic in left-operand variable order, merge/where/drop/
stack/to_stacked_array -- so the reference code can run UNMODIFIED as a
golden oracle against climsim_tpu.

This is test infrastructure only; nothing in climsim_tpu imports it.

Semantics verified against xarray docs/behavior:
  * binary ops between Datasets inner-join data_vars, keeping the left
    operand's variable order (the reference relies on this for feature
    ordering: data_utils.py:807-809 then to_stacked_array :815-819).
  * binary ops between DataArrays align by dimension NAME; result dims =
    left dims followed by right-only dims.
  * Dataset.to_stacked_array(new_dim, sample_dims) emits sample dims first
    and concatenates data_vars in dataset order, each contributing the
    product of its non-sample dim sizes.
"""

from __future__ import annotations

import operator

import numpy as np


def _resolve_hdf5_dims(dset):
    """Dim names for an HDF5 (netCDF-4) dataset via attached dim scales."""
    names = []
    for i, dim in enumerate(dset.dims):
        scales = list(dim.values())
        if scales:
            names.append(scales[0].name.rsplit("/", 1)[-1])
        elif dim.label:
            names.append(dim.label)
        else:
            names.append(f"phony_dim_{i}")
    return tuple(names)


def open_dataset(path, engine=None):  # engine accepted for API parity
    with open(path, "rb") as f:
        magic = f.read(8)
    ds = Dataset()
    if magic[:3] == b"CDF":
        # classic CDF via the repo's own pure-numpy reader
        from climsim_tpu.utils.ncread import read_classic

        nc = read_classic(path)
        for name, v in nc.variables.items():
            ds[name] = DataArray(np.asarray(v.data), v.dims, name)
        return ds
    if magic[:8] == b"\x89HDF\r\n\x1a\n":
        import h5py

        with h5py.File(path, "r") as f:
            for name in f.keys():
                obj = f[name]
                if not isinstance(obj, h5py.Dataset):
                    continue
                # skip phantom "netCDF dimension but not variable" entries
                nm = obj.attrs.get("NAME", b"")
                if isinstance(nm, bytes) and nm.startswith(
                        b"This is a netCDF dimension"):
                    continue
                ds[name] = DataArray(
                    np.asarray(obj[()]), _resolve_hdf5_dims(obj), name)
        return ds
    raise ValueError(f"{path}: unrecognized netCDF container")


def _union_dims(arrays):
    dims = []
    for a in arrays:
        if isinstance(a, DataArray):
            for d in a.dims:
                if d not in dims:
                    dims.append(d)
    return tuple(dims)


def _view(a, dims):
    """A numpy view of operand `a` positioned for broadcasting over `dims`."""
    if isinstance(a, DataArray):
        perm = [a.dims.index(d) for d in dims if d in a.dims]
        data = np.transpose(a.data, perm)
        idx = tuple(slice(None) if d in a.dims else None for d in dims)
        return data[idx]
    return a  # scalar or ndarray: plain numpy broadcasting


class DataArray:
    __array_priority__ = 100  # win binary ops against plain ndarrays

    def __init__(self, data, dims=None, name=None):
        self.data = np.asarray(data)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(self.data.ndim))
        self.dims = tuple(dims)
        self.name = name
        assert len(self.dims) == self.data.ndim, (self.dims, self.data.shape)

    # --- numpy interop ---------------------------------------------------
    @property
    def values(self):
        return self.data

    @property
    def shape(self):
        return self.data.shape

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.data, dtype)

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        dims = _union_dims(inputs)
        views = [_view(a, dims) for a in inputs]
        return DataArray(ufunc(*views, **kwargs), dims)

    def __len__(self):
        return self.data.shape[0]

    def copy(self):
        return DataArray(self.data.copy(), self.dims, self.name)

    def __getitem__(self, key):
        if key == slice(None):
            return self.data
        return self.data[key]

    def __setitem__(self, key, value):
        if isinstance(value, DataArray):
            value = value.data
        self.data[key] = value

    def mean(self, dim=None):
        if dim is None:
            return DataArray(self.data.mean(), ())
        ax = self.dims.index(dim)
        return DataArray(self.data.mean(axis=ax),
                         self.dims[:ax] + self.dims[ax + 1:])

    # --- arithmetic with dim-name alignment ------------------------------
    def _binop(self, other, op, reflexive=False):
        if isinstance(other, Dataset):
            return NotImplemented
        dims = _union_dims([self, other])
        a, b = _view(self, dims), _view(other, dims)
        if reflexive:
            a, b = b, a
        return DataArray(op(a, b), dims)


def _add_ops():
    for nm, op in [("add", operator.add), ("sub", operator.sub),
                   ("mul", operator.mul), ("truediv", operator.truediv),
                   ("pow", operator.pow)]:
        setattr(DataArray, f"__{nm}__",
                lambda s, o, _op=op: s._binop(o, _op))
        setattr(DataArray, f"__r{nm}__",
                lambda s, o, _op=op: s._binop(o, _op, reflexive=True))
    for nm, op in [("gt", operator.gt), ("lt", operator.lt),
                   ("ge", operator.ge), ("le", operator.le)]:
        setattr(DataArray, f"__{nm}__",
                lambda s, o, _op=op: s._binop(o, _op))


_add_ops()


class Dataset:
    def __init__(self, variables=None):
        self._vars = {}
        if variables:
            for k, v in variables.items():
                self[k] = v

    # --- mapping protocol -------------------------------------------------
    def __contains__(self, name):
        return name in self._vars

    def __iter__(self):
        return iter(self._vars)

    def keys(self):
        return self._vars.keys()

    @property
    def data_vars(self):
        return self._vars

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._vars[key]
        out = Dataset()
        for k in key:
            out._vars[k] = self._vars[k]
        return out

    def __setitem__(self, key, value):
        if not isinstance(value, DataArray):
            value = DataArray(np.asarray(value))
        value.name = key
        self._vars[key] = value

    def copy(self):
        out = Dataset()
        for k, v in self._vars.items():
            out._vars[k] = v.copy()
        return out

    # --- dataset ops used by data_utils ------------------------------------
    def merge(self, other):
        out = Dataset()
        out._vars.update(self._vars)
        for k, v in other._vars.items():
            out._vars[k] = v
        return out

    def drop(self, names):
        if isinstance(names, str):
            names = [names]
        out = Dataset()
        for k, v in self._vars.items():
            if k not in names:
                out._vars[k] = v
        return out

    def where(self, cond, drop=False):
        """Boolean selection along cond's dims (only the drop=True form the
        reference uses, data_utils.py:674-675)."""
        assert drop, "only where(..., drop=True) is implemented"
        assert len(cond.dims) == 1
        dim = cond.dims[0]
        mask = np.asarray(cond.data, bool)
        out = Dataset()
        for k, v in self._vars.items():
            if dim in v.dims:
                ax = v.dims.index(dim)
                out._vars[k] = DataArray(
                    np.take(v.data, np.nonzero(mask)[0], axis=ax),
                    v.dims, k)
            else:
                out._vars[k] = v
        return out

    def stack(self, mapping):
        """Single-dim stack only: {'batch': {'ncol'}} renames ncol->batch
        and moves it to the last axis (xarray stack semantics)."""
        out = Dataset()
        for new_dim, old_dims in mapping.items():
            (old,) = tuple(old_dims)
            for k, v in self._vars.items():
                if old in v.dims:
                    ax = v.dims.index(old)
                    data = np.moveaxis(v.data, ax, -1)
                    dims = tuple(d for d in v.dims if d != old) + (new_dim,)
                    out._vars[k] = DataArray(data, dims, k)
                else:
                    out._vars[k] = v
        return out

    def to_stacked_array(self, new_dim, sample_dims, name=None):
        (sample,) = tuple(sample_dims)
        parts = []
        for k, v in self._vars.items():
            ax = v.dims.index(sample)
            data = np.moveaxis(v.data, ax, 0)
            parts.append(data.reshape(data.shape[0], -1))
        return DataArray(np.concatenate(parts, axis=1),
                         (sample, new_dim), name)

    def to_netcdf(self, path):
        """Write as classic CDF-1 via scipy (enough for the expansion
        script's mlexpand output, climsim_adding_input.py:81)."""
        from scipy.io import netcdf_file

        f = netcdf_file(path, "w")
        dims = {}
        for v in self._vars.values():
            for d, s in zip(v.dims, v.data.shape):
                dims.setdefault(d, s)
        for d, s in dims.items():
            f.createDimension(d, s)
        for k, v in self._vars.items():
            var = f.createVariable(k, "f8", v.dims)
            var[:] = np.asarray(v.data, np.float64)
        f.flush()
        f.close()

    def _binop(self, other, op):
        out = Dataset()
        if isinstance(other, Dataset):
            for k, v in self._vars.items():  # inner join, left order
                if k in other._vars:
                    out._vars[k] = v._binop(other._vars[k], op)
        else:
            for k, v in self._vars.items():
                out._vars[k] = v._binop(other, op)
        return out

    def __sub__(self, other):
        return self._binop(other, operator.sub)

    def __mul__(self, other):
        return self._binop(other, operator.mul)

    def __truediv__(self, other):
        return self._binop(other, operator.truediv)

    def __add__(self, other):
        return self._binop(other, operator.add)
