/* Native Hamming-distance kernels for ASMK retrieval.
 *
 * Capability parity with the reference Cython module
 * (/root/reference/thirdparty/mast3r/asmk/cython/hamming.pyx):
 * binarize_and_pack_2D and hamming_cdist_packed, as a plain C extension
 * (CPython C API; no pybind11 in this environment).  The popcount loop is
 * the hot path of IVF search on the host while the TPU handles codebook
 * assignment.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

static PyObject *cdist(PyObject *self, PyObject *args) {
    PyArrayObject *A, *B;
    long dim;
    if (!PyArg_ParseTuple(args, "O!O!l", &PyArray_Type, &A, &PyArray_Type,
                          &B, &dim))
        return NULL;
    if (PyArray_TYPE(A) != NPY_UINT64 || PyArray_TYPE(B) != NPY_UINT64 ||
        PyArray_NDIM(A) != 2 || PyArray_NDIM(B) != 2) {
        PyErr_SetString(PyExc_TypeError, "expected 2D uint64 arrays");
        return NULL;
    }
    PyArrayObject *Ac =
        (PyArrayObject *)PyArray_GETCONTIGUOUS((PyArrayObject *)A);
    PyArrayObject *Bc =
        (PyArrayObject *)PyArray_GETCONTIGUOUS((PyArrayObject *)B);
    npy_intp na = PyArray_DIM(Ac, 0), nb = PyArray_DIM(Bc, 0);
    npy_intp words = PyArray_DIM(Ac, 1);
    if (PyArray_DIM(Bc, 1) != words) {
        Py_DECREF(Ac);
        Py_DECREF(Bc);
        PyErr_SetString(PyExc_ValueError, "word-count mismatch");
        return NULL;
    }

    npy_intp dims[2] = {na, nb};
    PyArrayObject *out =
        (PyArrayObject *)PyArray_SimpleNew(2, dims, NPY_FLOAT32);
    const uint64_t *a = (const uint64_t *)PyArray_DATA(Ac);
    const uint64_t *b = (const uint64_t *)PyArray_DATA(Bc);
    float *o = (float *)PyArray_DATA(out);
    const float inv = 1.0f / (float)dim;

    Py_BEGIN_ALLOW_THREADS
    for (npy_intp i = 0; i < na; i++) {
        const uint64_t *ai = a + i * words;
        for (npy_intp j = 0; j < nb; j++) {
            const uint64_t *bj = b + j * words;
            uint64_t cnt = 0;
            for (npy_intp k = 0; k < words; k++)
                cnt += (uint64_t)__builtin_popcountll(ai[k] ^ bj[k]);
            o[i * nb + j] = (float)cnt * inv;
        }
    }
    Py_END_ALLOW_THREADS

    Py_DECREF(Ac);
    Py_DECREF(Bc);
    return (PyObject *)out;
}

static PyMethodDef methods[] = {
    {"cdist", cdist, METH_VARARGS,
     "Normalized Hamming distance between packed uint64 rows"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "hamming_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_hamming_native(void) {
    import_array();
    return PyModule_Create(&module);
}
